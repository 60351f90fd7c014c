"""Decision-Transformer-style policy (flax).

Counterpart of the reference's DTPolicy (agents/models/DTPolicy.py, a
minGPT-derived model explicitly marked "Under Construction" at
DTPolicy.py:24).  Faithful to its token scheme — 6 tokens per timestep
(state grid embedding, operation, x, y, h, w) with return-to-go
conditioning — implemented as a compact causal transformer.  Like the
reference, this is a research scaffold rather than a shipped training
path; the smoke test only checks shapes/finiteness.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTConfig:
    n_layer: int = 4
    n_head: int = 8
    n_embd: int = 128
    max_timesteps: int = 100
    grid_size: int = 30
    num_colors: int = 10
    num_actions: int = 35
    dtype: jnp.dtype = jnp.float32


class CausalBlock(nn.Module):
    cfg: DTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        B, T, C = x.shape
        h = nn.LayerNorm()(x)
        mask = jnp.tril(jnp.ones((T, T), bool))
        att = nn.MultiHeadDotProductAttention(
            num_heads=c.n_head, dtype=c.dtype)(h, h, mask=mask[None, None])
        x = x + att
        h = nn.LayerNorm()(x)
        h = nn.Dense(4 * c.n_embd, dtype=c.dtype)(h)
        h = nn.gelu(h)
        x = x + nn.Dense(c.n_embd, dtype=c.dtype)(h)
        return x


class DTPolicy(nn.Module):
    """Tokens per timestep: [rtg, grid, op, x, y, h, w] -> predict the next
    action components autoregressively."""

    cfg: DTConfig = DTConfig()

    @nn.compact
    def __call__(self, grids, rtg, actions, timesteps):
        """grids i8 [B,T,30,30]; rtg f32 [B,T]; actions i32 [B,T,5]
        (x1,y1,x2,y2,op); timesteps i32 [B,T]."""
        c = self.cfg
        B, T = rtg.shape

        grid_tok = nn.Dense(c.n_embd, name="grid_proj")(
            jax.nn.one_hot(jnp.clip(grids, 0, c.num_colors - 1),
                           c.num_colors).reshape(B, T, -1))
        rtg_tok = nn.Dense(c.n_embd, name="rtg_proj")(rtg[..., None])
        op_tok = nn.Embed(c.num_actions, c.n_embd, name="op_emb")(
            jnp.clip(actions[..., 4], 0, c.num_actions - 1))
        coord_tok = nn.Dense(c.n_embd, name="coord_proj")(
            actions[..., :4].astype(jnp.float32) / c.grid_size)
        time_emb = nn.Embed(c.max_timesteps, c.n_embd, name="time_emb")(
            jnp.clip(timesteps, 0, c.max_timesteps - 1))

        # interleave [rtg, grid, action] per timestep
        toks = jnp.stack([rtg_tok, grid_tok, op_tok + coord_tok], axis=2)
        toks = toks + time_emb[:, :, None]
        x = toks.reshape(B, 3 * T, c.n_embd)
        for i in range(c.n_layer):
            x = CausalBlock(c, name=f"block_{i}")(x)
        x = nn.LayerNorm(name="ln_f")(x)

        # predict from the grid token of each step
        h = x.reshape(B, T, 3, c.n_embd)[:, :, 1]
        op_logits = nn.Dense(c.num_actions, name="head_op")(h)
        bbox = nn.Dense(4, name="head_bbox")(h)
        value = nn.Dense(1, name="head_value")(h).squeeze(-1)
        return {"op_logits": op_logits, "bbox": jax.nn.sigmoid(bbox),
                "value": value}
