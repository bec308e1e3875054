"""Regenerate a canonical-SMPL k-means cluster table (the asset the
reference precomputes under kmeans_dict/, SURVEY.md L0).

Usage:
    python -m transhuman_tpu.tools.make_kmeans --smpl_dir data/smplx/smpl \
        --num_clusters 300 out_dir/
"""

from __future__ import annotations


def main(argv=None):
    import argparse
    import os

    from ..geometry.clusters import ClusterSpec
    from ..geometry.smpl import SMPLModel

    p = argparse.ArgumentParser()
    p.add_argument("--smpl_dir", required=True)
    p.add_argument("--num_clusters", type=int, default=300)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("out_dir")
    args = p.parse_args(argv)

    smpl = SMPLModel.load(args.smpl_dir)
    spec = ClusterSpec.from_kmeans(
        smpl.v_template, args.num_clusters, seed=args.seed
    )
    os.makedirs(args.out_dir, exist_ok=True)
    path = os.path.join(args.out_dir, f"kmeans_dict_{args.num_clusters}.npy")
    spec.save_reference_dict(path)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
