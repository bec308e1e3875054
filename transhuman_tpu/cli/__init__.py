"""Command-line entry points (reference parity: train_net.py / run.py).

    python -m transhuman_tpu.cli.train --cfg_file configs/train_or_eval.yaml [k v ...]
    python -m transhuman_tpu.cli.run --type evaluate   --cfg_file ... [k v ...]
    python -m transhuman_tpu.cli.run --type visualize  --cfg_file ... [k v ...]
    python -m transhuman_tpu.cli.run --type reconstruction --cfg_file ... [k v ...]
"""

from .common import build_runtime, load_cluster_spec, load_smpl, parse_args  # noqa: F401
