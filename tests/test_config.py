import os

import pytest

from transhuman_tpu.config import Config

REF_YAML = "/root/reference/configs/train_or_eval.yaml"


def test_defaults_match_reference_protocol():
    cfg = Config()
    assert cfg.N_samples == 64
    assert cfg.num_class == 300
    assert cfg.KNN == 7
    assert cfg.embed_size == 192
    assert cfg.img_feat_size == 384
    assert cfg.patch.N_patches == 6 and cfg.patch.size == 20
    assert cfg.test.input_view == [0, 7, 15]
    assert cfg.H_render == 512 and cfg.W_render == 512


def test_merge_opts():
    cfg = Config().merge_opts(["train.lr", "1e-3", "num_class", "500", "jitter", "False"])
    assert cfg.train.lr == 1e-3
    assert cfg.num_class == 500
    assert cfg.jitter is False
    # original untouched (functional update)
    assert Config().num_class == 300


def test_merge_opts_yacs_comma_lists():
    """yacs literal_evals overrides, so the reference's shell scripts pass
    lists as bare comma strings (`scripts/test.sh`: `test.input_view 0,7,15`,
    `test.target_view 3,`). Must parse identically here."""
    cfg = Config().merge_opts(
        ["test.input_view", "0,7,15", "test.target_view", "3,", "test.mode",
         "model_x_motion_x", "exp_name", "official", "test.epoch", "2100"]
    )
    assert cfg.test.input_view == [0, 7, 15]
    assert cfg.test.target_view == [3]
    assert cfg.test.mode == "model_x_motion_x"
    assert cfg.test.epoch == 2100
    # one-shot generalization row of the reference script
    assert Config().merge_opts(["test.input_view", "0,"]).test.input_view == [0]
    # strings with commas that are not literals stay strings
    assert Config().merge_opts(["exp_name", "a,b"]).exp_name == "a,b"
    # str-typed fields take values VERBATIM — numeric comma strings must not
    # become lists (yacs would raise a type mismatch; verbatim is useful)
    assert Config().merge_opts(["exp_name", "1,2"]).exp_name == "1,2"
    assert Config().merge_opts(["exp_name", "2100"]).exp_name == "2100"


def test_unknown_key_raises():
    with pytest.raises(KeyError):
        Config().merge_opts(["definitely_not_a_key", "1"])


@pytest.mark.skipif(not os.path.exists(REF_YAML), reason="reference configs absent")
def test_loads_reference_yaml():
    cfg = Config.from_yaml(REF_YAML)
    assert cfg.num_class == 300
    assert cfg.vit_depth == 12
    assert cfg.train.lr == 7e-4
    assert cfg.train.scheduler.warmup_epochs == 300
    assert cfg.test.mode == "model_x_motion_x"
    assert cfg.patch.use_patch_sampling is True
    assert cfg.time_mult == [0, -20, 20]


@pytest.mark.skipif(not os.path.exists("/root/reference/configs"), reason="no ref")
def test_loads_all_reference_yamls():
    for name in os.listdir("/root/reference/configs"):
        Config.from_yaml(os.path.join("/root/reference/configs", name))


def test_merge_type_mismatch_raises():
    """yacs-parity type checking at merge time: scalar on a list field and
    list on a float field must fail loudly, not corrupt the config."""
    import pytest

    from transhuman_tpu.config import Config

    cfg = Config()
    with pytest.raises(TypeError, match="trailing comma"):
        cfg.merge_opts(["test.input_view", "3"])
    with pytest.raises(TypeError, match="ratio"):
        cfg.merge_opts(["ratio", "0,5"])
    # int widens to float; list parses onto list fields
    c2 = cfg.merge_opts(["ratio", "1", "test.input_view", "0,7,15"])
    assert c2.ratio == 1.0 and list(c2.test.input_view) == [0, 7, 15]
    # sections reject scalars
    with pytest.raises(TypeError, match="section"):
        cfg.merge_dict({"patch": 3})


def test_dataset_passthrough_and_reference_aliases():
    from transhuman_tpu.config import Config

    cfg = Config()
    assert cfg.merge_dict({"dataset": "h36m"}).dataset == "zju"
    assert cfg.merge_dict({"dataset": "thu"}).dataset == "zju"
    # unknown names pass through (fail loudly at registry lookup, not
    # silently train on the zju loader)
    assert cfg.merge_dict({"dataset": "mydata"}).dataset == "mydata"
