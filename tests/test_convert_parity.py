"""Checkpoint-converter parity: independent torch replicas of the reference
architecture (built from the documented spec, with reference-format state-dict
keys) are randomly initialized, converted with tools/convert_checkpoint, and
must produce numerically identical outputs through our flax modules.

This is the contract that makes official reference checkpoints loadable."""

import math

import jax
import jax.random
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from transhuman_tpu.models.encoder import SpatialEncoder
from transhuman_tpu.models.heads import NeRFHeads
from transhuman_tpu.models.vit import TransHE
from transhuman_tpu.tools.convert_checkpoint import convert_state_dict

torch.manual_seed(0)


# ---------------------------------------------------------------- torch nets
class TBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idt)


class TResNetStub(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = nn.Sequential(TBasicBlock(64, 64), TBasicBlock(64, 64))
        self.layer2 = nn.Sequential(
            TBasicBlock(64, 128, 2), TBasicBlock(128, 128)
        )


class TEncoder(nn.Module):
    def __init__(self, embed=192):
        super().__init__()
        self.model = TResNetStub()
        self.upsample_color = nn.Conv2d(3, 128, 1)
        self.reduction_layer = nn.Conv2d(384, embed, 1)

    def forward(self, x):
        h, w = x.shape[2:]
        y = F.relu(self.model.bn1(self.model.conv1(x)))
        lat = [y]
        y = self.model.maxpool(y)
        y = self.model.layer1(y)
        lat.append(y)
        y = self.model.layer2(y)
        lat.append(y)
        lat = [
            F.interpolate(l, (h, w), mode="bilinear", align_corners=True)
            for l in lat
        ]
        pix = torch.cat(lat + [self.upsample_color(x)], 1)
        return self.reduction_layer(pix), pix


class TAttn(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.num_heads = heads
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        h = self.num_heads
        qkv = self.qkv(x).reshape(B, N, 3, h, C // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = (q @ k.transpose(-2, -1)) * (C // h) ** -0.5
        a = a.softmax(-1)
        return self.proj((a @ v).transpose(1, 2).reshape(B, N, C))


class TBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TAttn(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, dim * 4)
        self.mlp.fc2 = nn.Linear(dim * 4, dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        y = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x + y


class TViT(nn.Module):
    def __init__(self, dim=192, depth=3, heads=3):
        super().__init__()
        self.dim = dim
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.mask_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.blocks = nn.ModuleList(TBlock(dim, heads) for _ in range(depth))
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def pe(self, xyz):  # pixelNeRF PE, freqs pi*2^k, no input
        nf = self.dim // 6
        freqs = np.pi * 2.0 ** torch.arange(nf, dtype=torch.float32)
        # addcmul, not mul+add: the two differ by an ulp, which decorrelates
        # the pi*2^k high bands — the reference uses addcmul
        emb = xyz.unsqueeze(-2).repeat(1, 1, nf * 2, 1)
        fr = torch.repeat_interleave(freqs, 2).view(1, 1, -1, 1)
        ph = torch.zeros(nf * 2)
        ph[1::2] = np.pi / 2
        emb = torch.sin(torch.addcmul(ph.view(1, 1, -1, 1), emb, fr))
        return emb.flatten(2)

    def forward(self, x, pe_xyz):
        x = x + self.pe(pe_xyz)
        for b in self.blocks:
            x = b(x)
        return self.norm(x)


class THeads(nn.Module):
    def __init__(self):
        super().__init__()
        self.fc_0 = nn.Conv1d(255, 256, 1)
        self.alpha_res_0 = nn.Conv1d(384, 256, 1)
        self.spatial_key_value_0 = nn.Module()
        self.spatial_key_value_0.key_embed = nn.Conv1d(256, 128, 1)
        self.spatial_key_value_0.value_embed = nn.Conv1d(256, 256, 1)
        self.spatial_key_value_1 = nn.Module()
        self.spatial_key_value_1.key_embed = nn.Conv1d(256, 128, 1)
        self.spatial_key_value_1.value_embed = nn.Conv1d(256, 256, 1)
        self.fc_1 = nn.Conv1d(256, 256, 1)
        self.fc_2 = nn.Conv1d(256, 256, 1)
        self.fc_3 = nn.Conv1d(256, 256, 1)
        self.alpha_fc = nn.Conv1d(256, 1, 1)
        self.feature_fc = nn.Conv1d(256, 256, 1)
        self.rgb_res_0 = nn.Conv1d(384, 256, 1)
        self.view_fc = nn.Conv1d(283, 128, 1)
        self.rgb_res_1 = nn.Conv1d(384, 128, 1)
        self.fc_4 = nn.Conv1d(128, 128, 1)
        self.rgb_fc = nn.Conv1d(128, 3, 1)

    def forward(self, human_rep, pixel_feat, viewdir):
        # human_rep/pixel_feat: (V, C, N); viewdir: (N, 27)
        v = human_rep.shape[0]
        net_ske = F.relu(self.fc_0(human_rep))
        net_pix = F.relu(self.alpha_res_0(pixel_feat))
        key = self.spatial_key_value_0.key_embed(net_pix.permute(2, 1, 0))
        val = self.spatial_key_value_0.value_embed(net_pix.permute(2, 1, 0))
        qk = self.spatial_key_value_1.key_embed(net_ske.permute(2, 1, 0))
        qv = self.spatial_key_value_1.value_embed(net_ske.permute(2, 1, 0))
        A = torch.bmm(key.transpose(1, 2), qk) / math.sqrt(128)
        A = F.softmax(A, dim=1)
        out = torch.bmm(val, A)
        net = (qv + out).permute(2, 1, 0)
        net = F.relu(self.fc_1(net))
        inter = F.relu(self.fc_2(net))
        opa = inter.mean(0, keepdim=True)
        alpha = self.alpha_fc(F.relu(self.fc_3(opa)))
        feat = self.feature_fc(inter) + self.rgb_res_0(pixel_feat)
        vd = viewdir.t().unsqueeze(0).expand(v, -1, -1)
        feat = torch.cat([feat, vd], 1)
        feat = F.relu(self.view_fc(feat)) + self.rgb_res_1(pixel_feat)
        feat = feat.mean(0, keepdim=True)
        rgb = self.rgb_fc(F.relu(self.fc_4(feat)))
        return torch.cat([rgb, alpha], 1).transpose(1, 2)[0]  # (N, 4)


class TFull(nn.Module):
    """Container matching the reference's top-level attribute names so that
    state_dict keys line up (cross_transformer.Network)."""

    def __init__(self, depth=3):
        super().__init__()
        self.encoder = TEncoder()
        self.ViT = TViT(depth=depth)
        h = THeads()
        for name, mod in h.named_children():
            setattr(self, name, mod)


@pytest.fixture(scope="module")
def converted():
    tf = TFull(depth=3)
    tf.train()
    variables = convert_state_dict(tf.state_dict())
    return tf, variables


def test_encoder_parity(converted, rng):
    tf, variables = converted
    x = rng.random((3, 32, 32, 3)).astype(np.float32)
    enc = SpatialEncoder(embed_dim=192)
    holder, pixel = enc.apply(
        {"params": variables["params"]["encoder"]}, x
    )
    with torch.no_grad():
        th, tp = tf.encoder(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(pixel), tp.permute(0, 2, 3, 1).numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(holder), th.permute(0, 2, 3, 1).numpy(), atol=2e-4
    )


def test_vit_parity(converted, rng):
    """With the reference-op-exact PE table (the top frequency band pi*2^31
    is f32 pseudo-noise that cannot be reproduced by an independent sin/cos
    formulation — see models/vit.py), block outputs must match torch."""
    from transhuman_tpu.tools.convert_checkpoint import reference_pe_table

    tf, variables = converted
    tokens = rng.standard_normal((3, 12, 192)).astype(np.float32)
    pe = rng.uniform(-1, 1, (12, 3)).astype(np.float32)
    table = reference_pe_table(pe, 192)  # (12, 192)
    # the converter table must equal the torch model's own PE bit-for-bit
    with torch.no_grad():
        t_table = tf.ViT.pe(torch.from_numpy(pe[None]))[0].numpy()
    np.testing.assert_array_equal(table, t_table)

    vit = TransHE(embed_dim=192, depth=3, num_heads=3)
    table_b = np.broadcast_to(table[None], (3, 12, 192))
    out = vit.apply(
        {"params": variables["params"]["transhe"]}, tokens, table_b
    )
    with torch.no_grad():
        tout = tf.ViT(torch.from_numpy(tokens), torch.from_numpy(np.broadcast_to(pe[None], (3, 12, 3)).copy()))
    np.testing.assert_allclose(np.asarray(out), tout.numpy(), atol=3e-4)


def test_heads_parity(converted, rng):
    tf, variables = converted
    v, n = 3, 40
    human = rng.standard_normal((v, n, 255)).astype(np.float32)
    pixel = rng.standard_normal((v, n, 384)).astype(np.float32)
    vd = rng.standard_normal((n, 27)).astype(np.float32)
    heads = NeRFHeads()
    raw = heads.apply(
        {"params": variables["params"]["heads"]}, human, pixel, vd
    )
    th = THeads()
    th.load_state_dict(
        {k: v for k, v in tf.state_dict().items()
         if not k.startswith(("encoder.", "ViT."))}
    )
    with torch.no_grad():
        traw = th(
            torch.from_numpy(human).permute(0, 2, 1),
            torch.from_numpy(pixel).permute(0, 2, 1),
            torch.from_numpy(vd),
        )
    np.testing.assert_allclose(np.asarray(raw), traw.numpy(), atol=3e-4)


def test_dropped_keys(converted):
    tf, variables = converted
    flat = jax.tree_util.tree_leaves_with_path(variables)
    paths = {"/".join(str(p) for p in path) for path, _ in flat}
    assert not any("cls_token" in p for p in paths)
    assert not any("layer3" in p for p in paths)


def test_resnet18_pretrained_import_drill(tmp_path, rng):
    """Rehearses the license-gated ImageNet-ResNet18 import end to end
    (reference: torchvision pretrained=True, encoder.py:77-79): a random
    state_dict in exact torchvision naming goes through the convert_resnet
    CLI (.pth -> .npz), merges into flax-initialized SpatialEncoder params
    via apply_pretrained (the train CLI's path, cli/train.py:101-103), and
    the encoder forward must match the torch replica carrying the same
    trunk weights (BN in batch-stats mode on both sides)."""
    from transhuman_tpu.tools.convert_resnet import apply_pretrained, main

    tenc = TEncoder()
    tenc.train()
    trunk_sd = tenc.model.state_dict()  # torchvision-format subset keys
    assert "layer2.0.downsample.0.weight" in trunk_sd

    pth, npz = tmp_path / "resnet18.pth", tmp_path / "resnet18.npz"
    torch.save(trunk_sd, pth)
    main([str(pth), str(npz)])

    x = rng.random((2, 32, 32, 3)).astype(np.float32)
    enc = SpatialEncoder(embed_dim=192)
    enc_vars = jax.tree.map(np.asarray, enc.init(jax.random.PRNGKey(0), x))
    # apply_pretrained addresses the full-model tree (params/encoder/...)
    variables = apply_pretrained(
        {"params": {"encoder": enc_vars["params"]}}, dict(np.load(npz))
    )

    # the color/reduction convs have no pretrained source: copy them from
    # the torch side so the full forwards are comparable
    p = variables["params"]["encoder"]
    for name, mod in (("color_conv", tenc.upsample_color),
                      ("reduction", tenc.reduction_layer)):
        p[name]["kernel"] = (
            mod.weight.detach().numpy().transpose(2, 3, 1, 0)
        )
        p[name]["bias"] = mod.bias.detach().numpy()

    holder, pixel = enc.apply({"params": p}, x)
    with torch.no_grad():
        th, tp = tenc(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(pixel), tp.permute(0, 2, 3, 1).numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(holder), th.permute(0, 2, 3, 1).numpy(), atol=2e-4
    )
