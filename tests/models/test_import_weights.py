"""Weight import: a real torch ViT forward must match our flax forward."""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from kobato_eyes_tpu.models.import_weights import vit_params_from_torch_state  # noqa: E402
from kobato_eyes_tpu.models.vit import ViT, vit_config  # noqa: E402


class TorchViT(torch.nn.Module):
    """Minimal timm-compatible ViT (pre-norm, cls token) for parity testing."""

    def __init__(self, img=32, patch=16, d=64, depth=2, heads=4, mlp=128, classes=10):
        super().__init__()
        self.patch_embed = torch.nn.ModuleDict(
            {"proj": torch.nn.Conv2d(3, d, patch, stride=patch)}
        )
        n_tok = (img // patch) ** 2 + 1
        self.cls_token = torch.nn.Parameter(torch.zeros(1, 1, d))
        self.pos_embed = torch.nn.Parameter(torch.randn(1, n_tok, d) * 0.02)
        self.blocks = torch.nn.ModuleList()
        for _ in range(depth):
            blk = torch.nn.Module()
            blk.norm1 = torch.nn.LayerNorm(d)
            blk.attn = torch.nn.Module()
            blk.attn.qkv = torch.nn.Linear(d, 3 * d)
            blk.attn.proj = torch.nn.Linear(d, d)
            blk.norm2 = torch.nn.LayerNorm(d)
            blk.mlp = torch.nn.Module()
            blk.mlp.fc1 = torch.nn.Linear(d, mlp)
            blk.mlp.fc2 = torch.nn.Linear(mlp, d)
            self.blocks.append(blk)
        self.norm = torch.nn.LayerNorm(d)
        self.head = torch.nn.Linear(d, classes)
        self.heads = heads
        self.d = d

    def forward(self, x):  # x: (B, C, H, W)
        b = x.shape[0]
        x = self.patch_embed["proj"](x).flatten(2).transpose(1, 2)  # (B, T, D)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        hd = self.d // self.heads
        for blk in self.blocks:
            y = blk.norm1(x)
            qkv = blk.attn.qkv(y).reshape(b, -1, 3, self.heads, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            attn = torch.einsum("bqhd,bkhd->bhqk", q, k) * hd**-0.5
            attn = attn.softmax(dim=-1)
            out = torch.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, -1, self.d)
            x = x + blk.attn.proj(out)
            y = blk.norm2(x)
            x = x + blk.mlp.fc2(torch.nn.functional.gelu(blk.mlp.fc1(y)))
        return self.head(self.norm(x)[:, 0])


def test_torch_vit_matches_flax_after_import(rng):
    torch.manual_seed(0)
    tm = TorchViT()
    tm.eval()
    cfg = vit_config(
        "tiny", image_size=32, patch_size=16, hidden_dim=64, depth=2,
        num_heads=4, mlp_dim=128, num_classes=10,
        dtype=jnp.float32,  # f32 so the comparison is tight
    )
    params = vit_params_from_torch_state(tm.state_dict(), cfg)

    x = rng.uniform(0, 1, size=(3, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(ViT(cfg).apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_missing_key_raises():
    with pytest.raises(KeyError):
        vit_params_from_torch_state(
            {}, vit_config("tiny", image_size=32, patch_size=16, num_classes=4)
        )


class TorchSwinV2(torch.nn.Module):
    """Minimal faithful SwinV2 (timm/MSR semantics) for import parity testing:
    cosine attention with clamped logit scale, q/v bias (zero k), log-CPB with
    the normalized [-8,8] coordinate table, -100 shift mask, post-norm blocks,
    patch merging with (0,0),(1,0),(0,1),(1,1) concat order then
    reduction->norm."""

    def __init__(self, img=16, patch=2, embed=16, depths=(2, 2), heads=(2, 4),
                 window=2, mlp_ratio=2.0, classes=11):
        super().__init__()
        import math

        self.img, self.patch, self.embed = img, patch, embed
        self.depths, self.heads, self.window = depths, heads, window
        self.patch_embed = torch.nn.ModuleDict({
            "proj": torch.nn.Conv2d(3, embed, patch, stride=patch),
            "norm": torch.nn.LayerNorm(embed),
        })
        self.layers = torch.nn.ModuleList()
        dim = embed
        for s, (depth, nh) in enumerate(zip(depths, heads)):
            layer = torch.nn.Module()
            if s > 0:
                layer.downsample = torch.nn.Module()
                layer.downsample.reduction = torch.nn.Linear(4 * (dim // 2), dim, bias=False)
                layer.downsample.norm = torch.nn.LayerNorm(dim)
            layer.blocks = torch.nn.ModuleList()
            for _ in range(depth):
                blk = torch.nn.Module()
                blk.attn = torch.nn.Module()
                blk.attn.qkv = torch.nn.Linear(dim, 3 * dim, bias=False)
                blk.attn.q_bias = torch.nn.Parameter(torch.randn(dim) * 0.1)
                blk.attn.v_bias = torch.nn.Parameter(torch.randn(dim) * 0.1)
                blk.attn.logit_scale = torch.nn.Parameter(
                    torch.log(10 * torch.ones(nh, 1, 1)))
                blk.attn.cpb_mlp = torch.nn.Sequential(
                    torch.nn.Linear(2, 512), torch.nn.ReLU(),
                    torch.nn.Linear(512, nh, bias=False))
                blk.attn.proj = torch.nn.Linear(dim, dim)
                blk.norm1 = torch.nn.LayerNorm(dim)
                blk.mlp = torch.nn.Module()
                blk.mlp.fc1 = torch.nn.Linear(dim, int(dim * mlp_ratio))
                blk.mlp.fc2 = torch.nn.Linear(int(dim * mlp_ratio), dim)
                blk.norm2 = torch.nn.LayerNorm(dim)
                layer.blocks.append(blk)
            self.layers.append(layer)
            dim *= 2
        dim //= 2
        self.norm = torch.nn.LayerNorm(dim)
        self.head = torch.nn.Linear(dim, classes)

    @staticmethod
    def _cpb_table(w):
        import math

        rh = torch.arange(-(w - 1), w, dtype=torch.float32)
        table = torch.stack(torch.meshgrid(rh, rh, indexing="ij"), dim=-1)
        table = table / max(w - 1, 1) * 8
        return torch.sign(table) * torch.log2(table.abs() + 1.0) / math.log2(8)

    @staticmethod
    def _rel_index(w):
        coords = torch.stack(torch.meshgrid(
            torch.arange(w), torch.arange(w), indexing="ij")).flatten(1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += w - 1
        rel[:, :, 1] += w - 1
        rel[:, :, 0] *= 2 * w - 1
        return rel.sum(-1)  # (w^2, w^2)

    def _attn(self, blk, xw, nh, mask):
        import torch.nn.functional as F

        bnw, n, c = xw.shape
        hd = c // nh
        qkv_bias = torch.cat((blk.attn.q_bias,
                              torch.zeros_like(blk.attn.v_bias), blk.attn.v_bias))
        qkv = F.linear(xw, blk.attn.qkv.weight, qkv_bias)
        qkv = qkv.reshape(bnw, n, 3, nh, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = F.normalize(q, dim=-1) @ F.normalize(k, dim=-1).transpose(-2, -1)
        import math

        scale = torch.clamp(blk.attn.logit_scale, max=math.log(100.0)).exp()
        attn = attn * scale
        w = self.window
        table = self._cpb_table(w).reshape(-1, 2)
        bias = blk.attn.cpb_mlp(table)[self._rel_index(w).view(-1)]
        bias = bias.view(n, n, nh).permute(2, 0, 1)
        attn = attn + (16 * torch.sigmoid(bias)).unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(bnw // nw, nw, nh, n, n) + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, nh, n, n)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(bnw, n, c)
        return blk.attn.proj(out)

    def forward(self, x):  # (B, C, H, W)
        b = x.shape[0]
        w = self.window
        x = self.patch_embed["proj"](x).permute(0, 2, 3, 1)  # (B, H', W', D)
        x = self.patch_embed["norm"](x)
        for s, layer in enumerate(self.layers):
            if s > 0:
                bb, hh, ww, cc = x.shape
                x0 = x[:, 0::2, 0::2, :]
                x1 = x[:, 1::2, 0::2, :]
                x2 = x[:, 0::2, 1::2, :]
                x3 = x[:, 1::2, 1::2, :]
                x = torch.cat([x0, x1, x2, x3], -1)
                x = layer.downsample.reduction(x)
                x = layer.downsample.norm(x)
            grid = x.shape[1]
            for i, blk in enumerate(layer.blocks):
                shift = 0 if i % 2 == 0 else w // 2
                shortcut = x
                y = torch.roll(x, (-shift, -shift), dims=(1, 2)) if shift else x
                if shift:
                    img = torch.zeros(grid, grid)
                    cnt = 0
                    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
                        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
                            img[hs, ws] = cnt
                            cnt += 1
                    mw = img.view(grid // w, w, grid // w, w).permute(0, 2, 1, 3).reshape(-1, w * w)
                    mask = (mw.unsqueeze(1) - mw.unsqueeze(2)) != 0
                    mask = mask.float().masked_fill(mask, -100.0)
                else:
                    mask = None
                yw = y.view(b, grid // w, w, grid // w, w, -1)
                yw = yw.permute(0, 1, 3, 2, 4, 5).reshape(-1, w * w, y.shape[-1])
                aw = self._attn(blk, yw, self.heads[s], mask)
                aw = aw.view(b, grid // w, grid // w, w, w, -1)
                y = aw.permute(0, 1, 3, 2, 4, 5).reshape(b, grid, grid, -1)
                if shift:
                    y = torch.roll(y, (shift, shift), dims=(1, 2))
                x = shortcut + blk.norm1(y)
                x = x + blk.norm2(blk.mlp.fc2(
                    torch.nn.functional.gelu(blk.mlp.fc1(x))))
        x = self.norm(x)
        feat = x.mean(dim=(1, 2))
        return self.head(feat)


def test_torch_swinv2_matches_flax_after_import(rng):
    from kobato_eyes_tpu.models.import_weights import swin_params_from_torch_state
    from kobato_eyes_tpu.models.swin import SwinConfig, SwinV2

    torch.manual_seed(1)
    tm = TorchSwinV2()
    tm.eval()
    cfg = SwinConfig(
        image_size=16, patch_size=2, embed_dim=16, depths=(2, 2),
        num_heads=(2, 4), window_size=2, mlp_ratio=2.0, num_classes=11,
        dtype=jnp.float32,  # f32 so the comparison is tight
    )
    params = swin_params_from_torch_state(tm.state_dict(), cfg)

    x = rng.uniform(0, 1, size=(2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(SwinV2(cfg).apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_swinv2_checkpoint_golden_tags(tmp_path):
    """End-to-end golden parity: torch SwinV2 state dict -> importer -> orbax
    checkpoint -> WD14Tagger(arch=swinv2).  The tagger's probabilities AND its
    selected tags for a fixture image must match the checkpoint's own torch
    forward (+ sigmoid + the same threshold policy)."""
    from kobato_eyes_tpu.models.import_weights import swin_params_from_torch_state
    from kobato_eyes_tpu.models.labels import synthetic_labels
    from kobato_eyes_tpu.models.preprocess import normalize_on_device
    from kobato_eyes_tpu.models.swin import SwinConfig
    from kobato_eyes_tpu.models.tagger import WD14Tagger, save_checkpoint

    torch.manual_seed(7)
    tm = TorchSwinV2(classes=24)
    tm.eval()
    cfg = SwinConfig(
        image_size=16, patch_size=2, embed_dim=16, depths=(2, 2),
        num_heads=(2, 4), window_size=2, mlp_ratio=2.0, num_classes=24,
        dtype=jnp.float32,
    )
    ckpt = tmp_path / "swin_ckpt"
    save_checkpoint(ckpt, swin_params_from_torch_state(tm.state_dict(), cfg))

    thr = {c: 0.45 for c in range(10)}
    tagger = WD14Tagger(
        labels=synthetic_labels(24), swin=cfg, checkpoint_path=ckpt,
        thresholds=thr, score_floor=0.05,
    )
    # own deterministic rng: the shared session fixture's stream position
    # depends on which tests ran before, which made the exact-rounding tag
    # comparison below order-dependent (flaked at a 1e-4 round boundary)
    img = np.random.default_rng(123).integers(0, 256, (20, 30, 3), dtype=np.uint8)
    batch = tagger.prepare_batch_from_rgb([img])

    x = np.asarray(normalize_on_device(jnp.asarray(batch), tagger.spec))
    with torch.no_grad():
        want_probs = torch.sigmoid(
            tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        ).numpy()[0]
    got_probs = np.asarray(tagger.forward_probs(batch))[0]
    np.testing.assert_allclose(got_probs, want_probs, atol=3e-5)

    results = tagger.infer_batch_prepared(batch)
    got_tags = {p.name: p.score for p in results[0].tags}
    want_tags = {
        m.name: float(want_probs[i])
        for i, m in enumerate(tagger.labels)
        if want_probs[i] >= max(thr.get(int(m.category), 1.0), tagger.score_floor)
    }
    assert got_tags.keys() == want_tags.keys() and got_tags, (got_tags, want_tags)
    for name, score in got_tags.items():
        assert abs(score - want_tags[name]) < 1e-4, (name, score, want_tags[name])


class TorchCLIPVisual(torch.nn.Module):
    """Minimal faithful CLIP visual tower (OpenAI semantics): bias-less patch
    conv, class/positional embeddings, ln_pre, pre-norm blocks with standard
    MHA (in_proj/out_proj) and QuickGELU MLP, ln_post on cls, linear proj."""

    def __init__(self, img=16, patch=4, d=32, depth=2, heads=4, mlp=64, embed=20):
        super().__init__()
        n_tok = (img // patch) ** 2 + 1
        self.d, self.heads = d, heads
        self.conv1 = torch.nn.Conv2d(3, d, patch, stride=patch, bias=False)
        self.class_embedding = torch.nn.Parameter(torch.randn(d) * 0.02)
        self.positional_embedding = torch.nn.Parameter(torch.randn(n_tok, d) * 0.02)
        self.ln_pre = torch.nn.LayerNorm(d)
        self.transformer = torch.nn.Module()
        self.transformer.resblocks = torch.nn.ModuleList()
        for _ in range(depth):
            blk = torch.nn.Module()
            blk.ln_1 = torch.nn.LayerNorm(d)
            blk.attn = torch.nn.MultiheadAttention(d, heads, batch_first=True)
            blk.ln_2 = torch.nn.LayerNorm(d)
            blk.mlp = torch.nn.ModuleDict({
                "c_fc": torch.nn.Linear(d, mlp),
                "c_proj": torch.nn.Linear(mlp, d),
            })
            self.transformer.resblocks.append(blk)
        self.ln_post = torch.nn.LayerNorm(d)
        self.proj = torch.nn.Parameter(torch.randn(d, embed) * d**-0.5)

    def forward(self, x):  # (B, C, H, W) -> L2-normalized (B, embed)
        b = x.shape[0]
        x = self.conv1(x).flatten(2).transpose(1, 2)
        cls = self.class_embedding.expand(b, 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x)
        for blk in self.transformer.resblocks:
            y = blk.ln_1(x)
            y, _ = blk.attn(y, y, y, need_weights=False)
            x = x + y
            y = blk.ln_2(x)
            y = blk.mlp["c_fc"](y)
            y = y * torch.sigmoid(1.702 * y)  # QuickGELU
            x = x + blk.mlp["c_proj"](y)
        feat = self.ln_post(x[:, 0]) @ self.proj
        return feat / feat.norm(dim=-1, keepdim=True).clamp_min(1e-6)


def test_torch_clip_matches_flax_after_import(rng):
    from kobato_eyes_tpu.index.embedder import ClipImageEncoder
    from kobato_eyes_tpu.models.import_weights import clip_vit_params_from_torch_state
    from kobato_eyes_tpu.models.vit import vit_config

    torch.manual_seed(5)
    tm = TorchCLIPVisual()
    tm.eval()
    cfg = vit_config(
        "tiny", image_size=16, patch_size=4, hidden_dim=32, depth=2,
        num_heads=4, mlp_dim=64, num_classes=20,
        ln_pre=True, patch_bias=False, act="quick_gelu",
        dtype=jnp.float32,
    )
    # prefixed keys (full-CLIP state dict shape)
    state = {f"visual.{k}": v for k, v in tm.state_dict().items()}
    params = clip_vit_params_from_torch_state(state, cfg)

    x = rng.uniform(0, 1, size=(3, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(
        ClipImageEncoder(cfg, embed_dim=20).apply({"params": params}, jnp.asarray(x))
    )
    np.testing.assert_allclose(got, want, atol=3e-5)
