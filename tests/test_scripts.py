"""The shipped scripts/*.sh launchers (parity wrappers for the reference's
scripts/{train,test,video,mesh}.sh) must stay syntactically valid and must
compose opts the Config parser accepts.

Reference: /root/reference/scripts/*.sh (positional contract: $1 card,
$2 epoch, $3 exp name).
"""

import os
import re
import subprocess

import pytest

from transhuman_tpu.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = ["train.sh", "test.sh", "video.sh", "mesh.sh"]


@pytest.mark.parametrize("name", SCRIPTS)
def test_script_syntax(name):
    path = os.path.join(REPO, "scripts", name)
    assert os.path.exists(path), path
    subprocess.run(["sh", "-n", path], check=True)


@pytest.mark.parametrize(
    "name, expected_mode",
    [("test.sh", "model_x_motion_x"), ("video.sh", "model_o_motion_x"),
     ("mesh.sh", "model_x_motion_x")],
)
def test_script_opts_merge(name, expected_mode):
    """Extract the active test_* variables from the script and merge them
    through Config exactly as the CLI would."""
    text = open(os.path.join(REPO, "scripts", name)).read()
    vals = {}
    for key in ("test_input_view", "test_target_view", "test_mode"):
        # last uncommented assignment wins
        ms = re.findall(rf"^{key}=['\"]?([^'\"\n]+)['\"]?", text, re.M)
        assert ms, f"{key} not found in {name}"
        vals[key] = ms[-1]
    cfg = Config().merge_opts(
        ["test.input_view", vals["test_input_view"],
         "test.target_view", vals["test_target_view"],
         "test.mode", vals["test_mode"],
         "test.epoch", "2100", "exp_name", "official"]
    )
    assert cfg.test.input_view == [0, 7, 15]
    assert all(isinstance(v, int) for v in cfg.test.target_view)
    assert cfg.test.mode == expected_mode
    assert cfg.test.epoch == 2100
