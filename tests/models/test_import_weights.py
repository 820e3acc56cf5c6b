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
