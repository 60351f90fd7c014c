"""Behavior cloning for the Decision-Transformer policy.

The reference's DTPolicy is "Under Construction" (DTPolicy.py:24) with no
shipped training loop; here the scaffold gets a working one: golden
oracle traces (the validation harness's own data) become (grid, action,
return-to-go) sequences, and :class:`~arcle_tpu.models.dt.DTPolicy`
trains with cross-entropy on the operation and MSE on the bbox — the
standard DT objective on offline ARC play data.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.dt import DTPolicy


class DTBatch(NamedTuple):
    grids: jax.Array      # i8 [B, T, 30, 30] pre-action grids
    rtg: jax.Array        # f32 [B, T] return-to-go
    actions: jax.Array    # i32 [B, T, 5] (x1, y1, x2, y2, op)
    timesteps: jax.Array  # i32 [B, T]
    mask: jax.Array       # f32 [B, T] 1 on real steps


def dataset_from_traces(tasks, traces, infos, T_max: int = 25) -> DTBatch:
    """Replay golden UI traces through the oracle, recording the
    *pre-action* grid, the (bbox, op) action, and sparse rewards; pad to
    ``T_max`` steps."""
    from ..oracle import OracleEnv
    from ..validation import convert_ui_action

    G, R, A, TS, M = [], [], [], [], []
    for trace, (ti, sub) in zip(traces, infos):
        orc = OracleEnv("o2arc", max_trial=-1)
        orc.reset(tasks[ti][2][sub], tasks[ti][3][sub])
        grids, acts, rews = [], [], []
        for entry in trace[:T_max]:
            op, sel = convert_ui_action(entry)
            st = orc.state
            grids.append(st["grid"].copy())
            if sel.any():
                rows = np.nonzero(sel.any(1))[0]
                cols = np.nonzero(sel.any(0))[0]
                bbox = [rows[0], cols[0], rows[-1], cols[-1]]
            else:
                bbox = [0, 0, 0, 0]
            acts.append(bbox + [op])
            if 20 <= op <= 27 and np.array_equal(
                    st["selected"].astype(bool), sel):
                sel = np.zeros((30, 30), bool)
            _st, r, term = orc.step(sel.astype(np.int8), op)
            rews.append(float(r))
            if term:
                break
        n = len(grids)
        rtg = np.cumsum(rews[::-1])[::-1]
        pad = T_max - n
        G.append(np.pad(np.stack(grids), ((0, pad), (0, 0), (0, 0))))
        R.append(np.pad(rtg, (0, pad)))
        A.append(np.pad(np.asarray(acts, np.int32), ((0, pad), (0, 0))))
        TS.append(np.pad(np.arange(n, dtype=np.int32), (0, pad)))
        M.append(np.pad(np.ones(n, np.float32), (0, pad)))
    return DTBatch(grids=jnp.asarray(np.stack(G), jnp.int8),
                   rtg=jnp.asarray(np.stack(R), jnp.float32),
                   actions=jnp.asarray(np.stack(A)),
                   timesteps=jnp.asarray(np.stack(TS)),
                   mask=jnp.asarray(np.stack(M)))


def bc_loss(params, model: DTPolicy, batch: DTBatch):
    """Predict each step's action from the history: CE on the operation +
    MSE on normalized bbox, masked to real steps."""
    out = model.apply(params, batch.grids, batch.rtg, batch.actions,
                      batch.timesteps)
    n_ops = out["op_logits"].shape[-1]
    ls = jax.nn.log_softmax(out["op_logits"], -1)
    classes = jax.lax.broadcasted_iota(jnp.int32, (n_ops,), 0)
    oh = (batch.actions[..., 4:5] == classes).astype(ls.dtype)
    ce = -jnp.sum(ls * oh, -1)
    tgt = batch.actions[..., :4].astype(jnp.float32) / model.cfg.grid_size
    mse = ((out["bbox"] - tgt) ** 2).sum(-1)
    denom = jnp.maximum(batch.mask.sum(), 1.0)
    return (((ce + mse) * batch.mask).sum() / denom)


def train_bc(model: DTPolicy, batch: DTBatch, key: jax.Array,
             n_steps: int = 50, lr: float = 3e-4) -> Tuple[dict, jax.Array]:
    """Full-batch Adam BC; returns (params, per-step losses)."""
    params = model.init(key, batch.grids, batch.rtg, batch.actions,
                        batch.timesteps)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def step(carry, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(bc_loss)(params, model, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, _), losses = jax.lax.scan(step, (params, opt_state), None,
                                       length=n_steps)
    return params, losses
