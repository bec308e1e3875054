"""E2E drill of the one-command real-asset parity runbook
(transhuman_tpu/tools/validate_official.py, VERDICT r3 item #2).

The real assets are license-gated and absent, so every input is a synthetic
stand-in at the exact formats the real files use: a fake on-disk ZJU layout,
an official-key-inventory .pth (vit_depth=2 for speed), a reference-format
kmeans dict, a synthetic SMPL pickle in the official pickle layout, the
REAL vendored LPIPS lin heads (present in the reference checkout) plus a
random VGG16 `features` state dict at the exact torchvision shapes.  The
day the real assets appear, the same command line with real paths is the
whole parity run.
"""

import json
import os

import numpy as np
import pytest
import torch

from tests.test_zju_data import fake_zju  # noqa: F401  (fixture reuse)
from transhuman_tpu.data.zju import ZJUDataset
from transhuman_tpu.geometry.clusters import ClusterSpec
from transhuman_tpu.models.lpips import VGG16_STAGES
from transhuman_tpu.tools.convert_checkpoint import official_key_inventory
from transhuman_tpu.tools.validate_official import main as vo_main

REAL_LINS = "/root/reference/third_parties/lpips/weights/v0.1/vgg.pth"
VIT_DEPTH = 2
NUM_CLASS = 8


def _write_official_pth(path):
    g = torch.Generator().manual_seed(0)
    sd = {}
    for k, shape in official_key_inventory(VIT_DEPTH).items():
        if k.endswith("num_batches_tracked"):
            sd[k] = torch.tensor(2100, dtype=torch.int64)
        elif k.endswith("running_var"):
            sd[k] = torch.rand(shape, generator=g) + 0.5
        else:
            sd[k] = torch.randn(shape, generator=g) * 0.02
    torch.save({"net": sd, "epoch": 2100}, path)


def _write_smpl_pickle(smpl, model_dir):
    """Synthetic SMPL in the official pickle layout (geometry/smpl.py:64-82:
    v_template/shapedirs/posedirs/J_regressor/weights/kintree_table/f)."""
    import pickle

    n_joints = smpl.weights.shape[1]
    kintree = np.zeros((2, n_joints), np.int64)
    kintree[1] = np.arange(n_joints)
    kintree[0, 1:] = smpl.parent  # ids == column indices here
    data = {
        "v_template": smpl.v_template,
        "shapedirs": smpl.shapedirs,
        "posedirs": smpl.posedirs,
        "J_regressor": smpl.J_regressor,
        "weights": smpl.weights,
        "kintree_table": kintree,
        "f": smpl.faces,
    }
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "SMPL_NEUTRAL.pkl"), "wb") as f:
        pickle.dump(data, f)


def _write_vgg16_features_pth(path):
    """Random weights at the exact torchvision vgg16.features shapes."""
    g = torch.Generator().manual_seed(1)
    sd, in_ch, li = {}, 3, 0
    for n_convs, ch in VGG16_STAGES:
        for _ in range(n_convs):
            sd[f"features.{li}.weight"] = (
                torch.randn(ch, in_ch, 3, 3, generator=g) * 0.05
            )
            sd[f"features.{li}.bias"] = torch.zeros(ch)
            in_ch = ch
            li += 2  # conv + relu
        li += 1  # maxpool
    torch.save(sd, path)


def _write_lins_pth(path):
    if os.path.exists(REAL_LINS):
        return REAL_LINS
    sd = {
        f"lin{si}.model.1.weight": torch.rand(1, ch, 1, 1)
        for si, (_, ch) in enumerate(VGG16_STAGES)
    }
    torch.save(sd, path)
    return path


def test_compare_fails_on_unmatched_expected_protocol():
    """An --expected key that matched no run must FAIL loudly, not report
    PASS with zero comparisons (e.g. a typo'd protocol name)."""
    from transhuman_tpu.tools.validate_official import DEFAULT_TOL, compare

    rows, ok = compare(
        {"fitting": {"psnr": 30.0, "ssim": 0.95, "lpips": None, "mse": 1e-3}},
        {"identity_generalisation": {"psnr": 24.8}},  # note the typo
        DEFAULT_TOL,
    )
    assert not ok
    bad = [r for r in rows if r.get("verdict") == "FAIL"]
    assert bad and "was not run" in bad[0]["error"]


def test_expected_template_schema():
    """The committed --expected template parses, its '_'-doc keys are
    skipped by compare(), and its 0.0 placeholders FAIL loudly if passed
    unedited (every protocol present, so nothing silently skips)."""
    import json

    from transhuman_tpu.tools.validate_official import (
        DEFAULT_TOL, PROTOCOLS, compare)

    with open(os.path.join(os.path.dirname(__file__), "..", "configs",
                           "expected_official.template.json")) as f:
        tpl = json.load(f)
    labels = {k for k in tpl if not k.startswith("_")}
    assert labels == {r[0] for r in PROTOCOLS}
    summaries = {lab: {"psnr": 30.0, "ssim": 0.95, "lpips": 0.08, "mse": 1e-3}
                 for lab in labels}
    rows, ok = compare(summaries, tpl, DEFAULT_TOL)
    assert not ok  # placeholders differ from any real run
    # the '_comment' key must not appear as a FAIL row
    assert not any(r["protocol"].startswith("_") for r in rows)
    # a filled-in template passes
    rows, ok = compare(summaries, {lab: dict(summaries[lab]) for lab in labels},
                       DEFAULT_TOL)
    assert ok


@pytest.fixture(scope="module")
def runbook_assets(fake_zju, tmp_path_factory):  # noqa: F811
    cfg0, smpl, info = fake_zju
    root = tmp_path_factory.mktemp("official_assets")
    _write_official_pth(root / "latest.pth")
    _write_smpl_pickle(smpl, str(root / "smpl"))
    kdir = root / "kmeans"
    os.makedirs(kdir)
    ClusterSpec.from_kmeans(smpl.v_template, NUM_CLASS, iters=3).save_reference_dict(
        str(kdir / f"kmeans_dict_{NUM_CLASS}.npy")
    )
    _write_vgg16_features_pth(root / "vgg16_features.pth")
    lins = _write_lins_pth(root / "lins.pth")
    return cfg0, smpl, info, root, lins


def _argv(cfg0, root, lins, workdir, extra=()):
    # doll-house overrides ride --opts and must win over the protocol's
    # full-scale view lists (3 cams / 64x64 images on the fake dataset)
    return [
        "--zju_root", cfg0.data_root,
        "--rasterize_root", cfg0.rasterize_root,
        "--official_ckpt", str(root / "latest.pth"),
        "--smpl_dir", str(root / "smpl"),
        "--kmeans", str(root / "kmeans" / f"kmeans_dict_{NUM_CLASS}.npy"),
        "--vgg16", str(root / "vgg16_features.pth"),
        "--lpips_lins", str(lins),
        "--workdir", str(workdir),
        "--cfg_file", "configs/train_or_eval.yaml",
        "--protocols", "identity_generalization",
        *extra,
        "--opts",
        "test.input_view", "0,1",
        "test.target_view", "2,",
        "vit_depth", str(VIT_DEPTH),
        "num_class", str(NUM_CLASS),
        # ratio 1.0: at 0.5 the 32x32 eval crops fall under LPIPS's 16-px
        # minimum side (the evaluator raises, by design)
        "ratio", "1.0",
        "N_samples", "8",
        "chunk_size", "64",
        "pad_bucket", "64",
        "voxel_size", "[0.06, 0.06, 0.06]",
    ]


def _dataset_factory(smpl, info):
    def factory(run_argv):
        from transhuman_tpu.cli.common import parse_args

        _, cfg = parse_args(run_argv, need_type=True)
        cfg = cfg.merge_dict({"run_mode": "test", "perturb": 0.0})
        return ZJUDataset(cfg, "test", smpl=smpl, human_info=info)

    return factory


def test_runbook_end_to_end(runbook_assets, tmp_path):
    cfg0, smpl, info, root, lins = runbook_assets
    work = tmp_path / "parity"
    rc = vo_main(
        _argv(cfg0, root, lins, work),
        dataset_factory=_dataset_factory(smpl, info),
    )
    assert rc == 0

    # converted artifacts landed where the eval looked for them
    assert (work / "model" / "transhuman" / "official" / "latest.ckpt").exists()
    assert (work / "lpips_vgg.npz").exists()

    report = json.loads((work / "parity_report.json").read_text())
    assert report["lpips"] is True
    (row,) = report["results"]
    assert row["protocol"] == "identity_generalization"
    assert np.isfinite(row["psnr"]) and np.isfinite(row["ssim"])
    assert row["lpips"] is not None and np.isfinite(row["lpips"])
    assert "verdict" not in row  # no --expected supplied
    assert (work / "parity_report.txt").read_text().startswith(
        "identity_generalization:"
    )

    # --expected: exact numbers -> PASS / rc 0; a shifted PSNR -> FAIL / rc 1
    exp_ok = {
        "identity_generalization": {
            "psnr": row["psnr"], "ssim": row["ssim"], "lpips": row["lpips"]
        }
    }
    p_ok = tmp_path / "exp_ok.json"
    p_ok.write_text(json.dumps(exp_ok))
    rc = vo_main(
        _argv(cfg0, root, lins, work, extra=("--expected", str(p_ok))),
        dataset_factory=_dataset_factory(smpl, info),
    )
    assert rc == 0
    report = json.loads((work / "parity_report.json").read_text())
    assert report["results"][0]["verdict"] == "PASS"

    exp_bad = {"identity_generalization": {"psnr": row["psnr"] + 1.0}}
    p_bad = tmp_path / "exp_bad.json"
    p_bad.write_text(json.dumps(exp_bad))
    rc = vo_main(
        _argv(cfg0, root, lins, work, extra=("--expected", str(p_bad))),
        dataset_factory=_dataset_factory(smpl, info),
    )
    assert rc == 1
    report = json.loads((work / "parity_report.json").read_text())
    assert report["results"][0]["verdict"] == "FAIL"
    assert abs(report["results"][0]["delta"]["psnr"] + 1.0) < 1e-6
