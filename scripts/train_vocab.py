#!/usr/bin/env python
"""Train the BRIEF bag-of-words vocabulary from synthetic renders.

The reference ships a TRAINED DBoW2 binary vocabulary and loads it at
startup (`pose_graph/src/pose_graph_node.cpp:297-314`,
`VocabularyBinary.cpp`); this is the TPU framework's equivalent trainer:
k-majority k-means over BRIEF descriptors harvested from rendered
keyframes of several procedurally-textured worlds, saved bit-packed with
tf-idf weights (`ops/brief.py: train_vocabulary / save_vocabulary`).

Usage: python scripts/train_vocab.py [out.npz] [--words 1024]
       [--worlds 6] [--frames 24] [--size 320x240]
"""
import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def harvest(world, traj, times, width, height, f=200.0, max_pts=96):
    """Per-frame GFTT keypoints + BRIEF descriptors of rendered views."""
    import jax.numpy as jnp

    from lvislam_tpu.ops import brief, gftt
    from lvislam_tpu.utils import synthetic as syn

    descs, valids = [], []
    for t in times:
        img = syn.render_camera_image(world, traj, float(t),
                                      width=width, height=height, f=f)
        im = jnp.asarray(img)
        kp, ok = gftt.detect(im, jnp.zeros((1, 2), im.dtype),
                             jnp.zeros(1, bool),
                             max_pts=max_pts, cell=12, border=16)
        d = brief.describe(im, kp, ok)
        descs.append(np.asarray(d))
        valids.append(np.asarray(ok))
    return descs, valids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="configs/brief_vocab.npz")
    ap.add_argument("--words", type=int, default=1024)
    ap.add_argument("--worlds", type=int, default=6)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--size", default="320x240")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))

    from lvislam_tpu.ops import brief
    from lvislam_tpu.utils import synthetic as syn

    all_d, all_ids = [], []
    img_id = 0
    for seed in range(args.worlds):
        world = syn.default_world(seed=seed)
        traj = syn.circle_trajectory(radius=3.0 + 0.5 * seed,
                                     period=20.0 + 2 * seed)
        times = np.linspace(0.5, 20.0, args.frames)
        descs, valids = harvest(world, traj, times, w, h)
        for d, v in zip(descs, valids):
            all_d.append(d[np.asarray(v)])
            all_ids.append(np.full(int(v.sum()), img_id))
            img_id += 1
        print(f"world {seed}: {sum(len(x) for x in all_d)} descriptors so far",
              flush=True)

    desc = np.concatenate(all_d)
    ids = np.concatenate(all_ids)
    print(f"training {args.words} words on {len(desc)} descriptors "
          f"from {img_id} frames", flush=True)
    vocab, idf = brief.train_vocabulary(
        desc, n_words=args.words, iters=args.iters, image_ids=ids,
    )
    # quantization report: word usage entropy (flat = well-spread)
    a = np.argmax(desc @ vocab.T, axis=1)
    p = np.bincount(a, minlength=args.words) / len(a)
    ent = -np.sum(p[p > 0] * np.log2(p[p > 0]))
    print(f"word-usage entropy {ent:.2f} bits (max {np.log2(args.words):.2f})")
    brief.save_vocabulary(args.out, vocab, idf)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
