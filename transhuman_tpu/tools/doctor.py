"""Environment + asset diagnostic for new installs and migrations.

    python -m transhuman_tpu.tools.doctor [--cfg_file configs/....yaml] [opts ...]

Checks every external thing a run needs — devices, compilation cache, SMPL
pickle, k-means dict, dataset layout (annots/images/masks/vertices/params/
rasterization), converted weights, checkpoints, the C++ mesh backends — and
prints one PASS/WARN/FAIL line each with the exact fix (the reference fails
these one at a time with stack traces spread over the first minutes of a
run).  Exit code 1 iff any FAIL.

Read-only: never creates directories or touches the dataset.
"""

from __future__ import annotations

import os
import sys

from ..config import Config

PASS, WARN, FAIL = "PASS", "WARN", "FAIL"


class Doctor:
    def __init__(self):
        self.rows = []

    def add(self, level, what, detail=""):
        self.rows.append((level, what, detail))

    def report(self) -> int:
        width = max(len(w) for _, w, _ in self.rows) if self.rows else 0
        for level, what, detail in self.rows:
            line = f"[{level}] {what.ljust(width)}"
            if detail:
                line += f"  — {detail}"
            print(line)
        fails = sum(1 for lv, _, _ in self.rows if lv == FAIL)
        warns = sum(1 for lv, _, _ in self.rows if lv == WARN)
        print(f"\n{len(self.rows)} checks: {fails} FAIL, {warns} WARN")
        return 1 if fails else 0


def check_devices(d: Doctor):
    try:
        import jax

        devs = jax.devices()
        plat = devs[0].platform
        lv = PASS if plat != "cpu" else WARN
        d.add(lv, "devices", f"{len(devs)}x {plat}"
              + ("" if plat != "cpu" else " (no accelerator: fine for tests,"
                 " slow for real workloads)"))
    except Exception as e:
        d.add(FAIL, "devices", f"jax backend init failed: {e}")


def check_compile_cache(d: Doctor):
    import jax

    cc = jax.config.values.get("jax_compilation_cache_dir")
    if cc:
        d.add(PASS, "compilation cache", cc)
    else:
        d.add(WARN, "compilation cache",
              "unset — first compiles (2-6 min through a TPU tunnel) are "
              "re-paid every process; set jax_compilation_cache_dir")


def check_smpl(d: Doctor, cfg: Config):
    pkl = os.path.join(cfg.smpl_dir, "SMPL_NEUTRAL.pkl")
    if os.path.exists(pkl):
        try:
            from ..geometry.smpl import SMPLModel

            m = SMPLModel.load(cfg.smpl_dir)
            d.add(PASS, "SMPL model", f"{pkl} ({m.v_template.shape[0]} verts)")
        except Exception as e:
            d.add(FAIL, "SMPL model", f"{pkl} unreadable: {e}")
    else:
        d.add(WARN, "SMPL model",
              f"{pkl} missing — synthetic stand-in body will be used "
              "(tests/benchmarks only; real renders need the real pickle)")


def check_kmeans(d: Doctor, cfg: Config):
    p = os.path.join(cfg.kmeans_dir, f"kmeans_dict_{cfg.num_class}.npy")
    if os.path.exists(p):
        try:
            from ..geometry.clusters import ClusterSpec

            spec = ClusterSpec.load_reference_dict(p)
            d.add(PASS, "k-means dict",
                  f"{p} ({spec.num_clusters} clusters)")
        except Exception as e:
            d.add(FAIL, "k-means dict", f"{p} unreadable: {e}")
    else:
        d.add(WARN, "k-means dict",
              f"{p} missing — on-the-fly k-means will run once and cache "
              "(or: python -m transhuman_tpu.tools.make_kmeans)")


def check_dataset(d: Doctor, cfg: Config):
    root = cfg.data_root
    if not os.path.isdir(root):
        d.add(FAIL, "dataset root",
              f"{root!r} is not a directory (cfg.data_root)")
        return
    from ..data import catalog

    try:
        info = catalog.get_human_info(
            "test" if cfg.run_mode == "test" else "train", cfg.test.mode
        )
    except KeyError:
        d.add(FAIL, "test mode", f"unknown cfg.test.mode {cfg.test.mode!r}")
        return
    present = [h for h in info if os.path.isdir(os.path.join(root, h))]
    if not present:
        d.add(FAIL, "dataset humans",
              f"none of {list(info)} exist under {root!r}")
        return
    if len(present) < len(info):
        missing = sorted(set(info) - set(present))
        d.add(WARN, "dataset humans", f"missing: {missing} (will be skipped)")
    else:
        d.add(PASS, "dataset humans", f"{len(present)}/{len(info)} present")

    import numpy as np

    h = present[0]
    ann = os.path.join(root, h, "annots.npy")
    if not os.path.exists(ann):
        d.add(FAIL, "annots", f"{ann} missing")
        return
    try:
        annots = np.load(ann, allow_pickle=True).item()
        cams = annots["cams"]
        n_cams = len(cams["K"])
        d.add(PASS, "annots", f"{ann} ({n_cams} cameras, "
              f"{len(annots['ims'])} frames)")
    except Exception as e:
        d.add(FAIL, "annots", f"{ann} unreadable: {e}")
        return

    # spot-check one image + mask + vertices + params via the dataset itself
    try:
        from ..data.zju import ZJUDataset
        from ..geometry.smpl import SMPLModel

        try:
            smpl = SMPLModel.load(cfg.smpl_dir)
        except Exception:
            smpl = SMPLModel.synthetic()
        ds = ZJUDataset(cfg, "test" if cfg.run_mode == "test" else "train",
                        smpl=smpl, human_info={k: info[k] for k in present})
        item = ds.get_eval_item(0)
        d.add(PASS, "sample frame",
              f"{item.human} f{item.frame_index}: image "
              f"{item.target_img.shape}, {item.eval_rays.rays.ray_o.shape[0]}"
              " rays in box")
    except Exception as e:
        d.add(FAIL, "sample frame", f"loading item 0 failed: {e}")

    rast = os.path.join(cfg.rasterize_root, h, "visibility")
    if cfg.rasterize and not os.path.isdir(rast):
        d.add(WARN, "vizmaps",
              f"{rast} missing — all-ones visibility fallback (matches the "
              "reference's fallback, worse painting quality)")
    elif cfg.rasterize:
        d.add(PASS, "vizmaps", rast)


def check_weights(d: Doctor, cfg: Config):
    if cfg.encoder_weights:
        lv = PASS if os.path.exists(cfg.encoder_weights) else FAIL
        d.add(lv, "encoder weights (ResNet18)", cfg.encoder_weights)
    elif cfg.pretrained:
        d.add(WARN, "encoder weights (ResNet18)",
              "cfg.pretrained=True but encoder_weights unset — random "
              "encoder init (convert with tools/convert_resnet)")
    if cfg.lpips_weights:
        lv = PASS if os.path.exists(cfg.lpips_weights) else FAIL
        d.add(lv, "LPIPS weights", cfg.lpips_weights)
    else:
        d.add(WARN, "LPIPS weights",
              "unset — perceptual loss and eval LPIPS column disabled "
              "(convert with tools/convert_lpips)")


def check_checkpoint(d: Doctor, cfg: Config):
    from .. import cli

    mdir = os.path.join(cfg.trained_model_dir, cfg.task, cfg.exp_name)
    # the loader accepts latest.ckpt OR any ep{N}.ckpt (picks test.epoch /
    # max epoch) — flag only what load_checkpoint would actually reject
    import glob

    ckpts = sorted(glob.glob(os.path.join(mdir, "*.ckpt")))
    if ckpts:
        latest = os.path.join(mdir, "latest.ckpt")
        d.add(PASS, "checkpoint",
              latest if latest in ckpts else
              f"{len(ckpts)} epoch ckpts (no latest.ckpt; loader picks "
              f"test.epoch/max: {os.path.basename(ckpts[-1])})")
    elif cfg.run_mode == "test":
        d.add(FAIL, "checkpoint",
              f"no .ckpt under {mdir} — eval/visualize need one "
              "(convert the official .pth with tools/convert_checkpoint)")
    else:
        d.add(WARN, "checkpoint", f"none under {mdir} (fresh training run)")
    _ = cli  # imported only to fail loudly if the CLI package is broken


def check_native(d: Doctor):
    from ..mesh_ops.marching import _load_native

    if _load_native() is not None:
        d.add(PASS, "C++ marching backend", "loaded")
    else:
        d.add(WARN, "C++ marching backend",
              "not built — numpy fallback (identical output, slower); "
              "build: make -C transhuman_tpu/native")


def main(argv=None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    cfg_file = None
    if "--cfg_file" in args:
        i = args.index("--cfg_file")
        cfg_file = args[i + 1]
        del args[i : i + 2]
    cfg = Config.from_yaml(cfg_file, opts=args)

    d = Doctor()
    check_devices(d)
    check_compile_cache(d)
    check_smpl(d, cfg)
    check_kmeans(d, cfg)
    check_dataset(d, cfg)
    check_weights(d, cfg)
    check_checkpoint(d, cfg)
    check_native(d)
    return d.report()


if __name__ == "__main__":
    sys.exit(main())
