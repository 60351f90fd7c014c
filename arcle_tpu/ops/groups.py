"""The grid-operator library: every ARCLE operation as a pure function.

Each *group* function has the uniform signature

    group(state: EnvState, sel: i8[H,W], pre: SelPre, param: i32[], cfg) -> EnvState

and implements one semantic family of the reference's 35-operation surface
(see the op tables in /root/reference/arcle/envs/{arcenv.py,o2arcenv.py}).
A fused ``transition`` in :mod:`arcle_tpu.ops.table` evaluates the groups
and folds them with ``lax.select_n`` on the per-env group index — under
``vmap`` every branch is computed anyway (select semantics), so we lean
into that and share the expensive sub-computations (selection bbox, the
object-selection state machine) across branches instead of paying them per
op.

Bit-exactness notes (verified against the reference by the parity suite):

* Color fills selected cells *even outside grid_dim* (color.py:70-77).
* FloodFill NOOPs unless the selection sums to exactly 1 and the pixel is
  inside grid_dim (color.py:88-97); the filled region is the 4-connected
  same-color component *within* grid_dim.
* Copy's out-of-bound test uses ``xmax > src_h`` — strictly greater, an
  off-by-one kept for parity (object.py:301).
* Paste is clipped to the full HxW frame, not to grid_dim
  (object.py:331-348), and the shipped envs use ``paste_blank=True``
  (zeros in the clipboard overwrite the grid).
* The floating object may move entirely off-grid and come back
  (object.py:113-138): placement uses signed whole-grid index arithmetic.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

from ..core.state import EnvState, I8, I32
from ..core.geometry import (
    bbox, inside_dims, row_col_iota, shift2d, window_mask, place_patch,
)
from ..core.floodfill import (
    connected_component, connected_component_partial,
)


# --------------------------------------------------------------------------
# Group codes (static, used to build per-family op tables)
# --------------------------------------------------------------------------
class G:
    NOOP = 0
    COLOR = 1
    FLOOD = 2
    OBJECT = 3
    COPY = 4
    PASTE = 5
    COPY_FROM_INPUT = 6
    RESET_GRID = 7
    RESIZE_GRID = 8
    CROP_GRID = 9
    SUBMIT = 10
    RESIZE_TO_ANSWER = 11
    COUNT = 12


# Object-group sub-kinds (param values for G.OBJECT)
class OBJ:
    MOVE_U = 0
    MOVE_D = 1
    MOVE_R = 2
    MOVE_L = 3
    ROT_90 = 4    # CCW (reference gen_rotate(1))
    ROT_270 = 5   # CW  (reference gen_rotate(3))
    FLIP_H = 6
    FLIP_V = 7
    FLIP_D0 = 8   # transpose       (gen_flip("D0"))
    FLIP_D1 = 9   # anti-transpose  (gen_flip("D1"))


@dataclasses.dataclass(frozen=True)
class SelPre:
    """Shared precomputation over the action's selection mask."""

    any: jax.Array      # bool []  - any truthy cell
    rmin: jax.Array     # i32 []
    rmax: jax.Array
    cmin: jax.Array
    cmax: jax.Array
    total: jax.Array    # i32 []   - sum of int8 values (flood-fill NOOP rule)
    px: jax.Array       # i32 []   - argmax row (flood seed)
    py: jax.Array       # i32 []   - argmax col


def precompute_selection(sel: jax.Array) -> SelPre:
    nonempty, rmin, rmax, cmin, cmax = bbox(sel)
    total = jnp.sum(sel.astype(I32))
    flat = jnp.argmax(sel.reshape(-1)).astype(I32)
    W = sel.shape[1]
    return SelPre(
        any=nonempty, rmin=rmin, rmax=rmax, cmin=cmin, cmax=cmax,
        total=total, px=flat // W, py=flat % W,
    )


@dataclasses.dataclass(frozen=True)
class Shared:
    """Expensive sub-computations shared across group candidates (they are
    all evaluated every step under the select-all dispatch, so every
    duplicated 5-stage dynamic roll costs real bandwidth).

    ``grid_sh`` / ``selp_sh`` / ``input_sh`` are the grid / truthy
    selection / input arrays shifted so the selection bbox corner sits at
    the origin — used identically by the object-selection init
    (object.py:77-84), Copy (object.py:310-312), and CropGrid
    (critical.py:59-63).
    """

    grid_sh: jax.Array    # i8 [H,W]
    selp_sh: jax.Array    # bool [H,W]
    input_sh: jax.Array   # i8 [H,W]
    match: jax.Array      # bool [] - answers_match on the pre-op state
    flood: object         # FloodInfo | None


jax.tree_util.register_dataclass(
    Shared,
    data_fields=["grid_sh", "selp_sh", "input_sh", "match", "flood"],
    meta_fields=[])


def precompute_shared(state: EnvState, sel: jax.Array, pre: SelPre,
                      flood) -> Shared:
    return Shared(
        grid_sh=shift2d(state.grid, -pre.rmin, -pre.cmin),
        selp_sh=shift2d((sel != 0).astype(I8), -pre.rmin, -pre.cmin) != 0,
        input_sh=shift2d(state.input, -pre.rmin, -pre.cmin),
        match=answers_match(state),
        flood=flood,
    )


def _d32(v: jax.Array) -> jax.Array:
    return v.astype(I32)


# --------------------------------------------------------------------------
# Simple groups
# --------------------------------------------------------------------------
def noop(state: EnvState, sel, pre, param, cfg, shared) -> EnvState:
    return state


def color_fill(state: EnvState, sel, pre, param, cfg, shared) -> EnvState:
    """Color0..9: masked fill, intentionally not clipped to grid_dim."""
    grid = jnp.where(sel != 0, param.astype(I8), state.grid)
    return state.replace(grid=grid)


@dataclasses.dataclass(frozen=True)
class FloodInfo:
    """Precomputed flood-fill analysis shared into the FLOOD branch."""

    valid: jax.Array      # bool [] - single-pixel-in-bounds rule holds
    comp: jax.Array       # bool [H,W] - component mask (may be partial)
    converged: jax.Array  # bool [] - comp is the full component


jax.tree_util.register_dataclass(
    FloodInfo, data_fields=["valid", "comp", "converged"], meta_fields=[])


def flood_analysis(state: EnvState, pre: SelPre,
                   unroll: int = 2) -> FloodInfo:
    """FloodFill preconditions + partial component (color.py:88-99).

    ``unroll`` fused sweeps resolve typical components with no control
    flow; ``converged`` tells the caller whether a fixpoint fallback is
    still needed (run at batch level behind a scalar cond, or via
    :func:`finish_flood` for the single-env path).
    """
    H, W = state.grid.shape
    gd = _d32(state.grid_dim)
    valid = (pre.total == 1) & (pre.px < gd[0]) & (pre.py < gd[1])
    seed_color = state.grid[pre.px, pre.py]
    region = (state.grid == seed_color) & inside_dims(state.grid_dim, H, W)
    rows, cols = row_col_iota(H, W)
    seed = (rows == pre.px) & (cols == pre.py)
    comp, conv = connected_component_partial(region, seed, unroll)
    return FloodInfo(valid=valid, comp=comp, converged=conv)


def full_component(grid: jax.Array, grid_dim: jax.Array,
                   px: jax.Array, py: jax.Array) -> jax.Array:
    """Fixpoint component for the fallback paths (the reference ``dfs``)."""
    H, W = grid.shape
    seed_color = grid[px, py]
    region = (grid == seed_color) & inside_dims(grid_dim, H, W)
    rows, cols = row_col_iota(H, W)
    seed = (rows == px) & (cols == py)
    return connected_component(region, seed)


def flood_fill(state: EnvState, sel, pre, param, cfg, shared) -> EnvState:
    """FloodFill0..9 (color.py:88-102) using precomputed analysis.

    Writes only when the component is already complete; a deferred env
    (valid but unconverged) leaves the grid untouched for the caller's
    fixpoint fallback to patch."""
    flood = shared.flood
    write = flood.valid & flood.converged
    grid = jnp.where(flood.comp & write, param.astype(I8), state.grid)
    return state.replace(grid=grid)


def copy_from_input(state: EnvState, sel, pre, param, cfg, shared) -> EnvState:
    """critical.py:19-29: grid <- input (full frame), grid_dim <- input_dim."""
    return state.replace(grid=state.input, grid_dim=state.input_dim)


def reset_grid(state: EnvState, sel, pre, param, cfg, shared) -> EnvState:
    """critical.py:8-17: zero the grid, keep dims."""
    return state.replace(grid=jnp.zeros_like(state.grid))


def resize_grid(state: EnvState, sel, pre, param, cfg, shared) -> EnvState:
    """critical.py:31-46: grid_dim <- bbox(sel) size, grid zeroed."""
    h = pre.rmax - pre.rmin + 1
    w = pre.cmax - pre.cmin + 1
    new_dim = jnp.stack([h, w]).astype(I8)
    return state.replace(
        grid=jnp.where(pre.any, jnp.zeros_like(state.grid), state.grid),
        grid_dim=jnp.where(pre.any, new_dim, state.grid_dim),
    )


def crop_grid(state: EnvState, sel, pre, param, cfg, shared) -> EnvState:
    """critical.py:48-66: extract selected nonzero cells of bbox(sel) to the
    origin and shrink dims (installed as op 33 by the agents env)."""
    H, W = state.grid.shape
    h = pre.rmax - pre.rmin + 1
    w = pre.cmax - pre.cmin + 1
    rows, cols = row_col_iota(H, W)
    win = (rows < h) & (cols < w)
    keep = win & shared.selp_sh & (shared.grid_sh != 0)
    patch = jnp.where(keep, shared.grid_sh, 0).astype(I8)
    new_dim = jnp.stack([h, w]).astype(I8)
    return state.replace(
        grid=jnp.where(pre.any, patch, state.grid),
        grid_dim=jnp.where(pre.any, new_dim, state.grid_dim),
    )


def resize_to_answer(state: EnvState, sel, pre, param, cfg, shared) -> EnvState:
    """RawARCEnv op 10 (arcenv.py:31-35): dims <- answer shape, zero outside."""
    H, W = state.grid.shape
    grid = jnp.where(inside_dims(state.answer_dim, H, W), state.grid, 0)
    return state.replace(grid=grid.astype(I8), grid_dim=state.answer_dim)


# --------------------------------------------------------------------------
# Clipboard
# --------------------------------------------------------------------------
def copy_to_clip(state: EnvState, sel, pre, param, cfg, shared) -> EnvState:
    """Copy_I (param=0) / Copy_O (param=1), object.py:281-314."""
    H, W = state.grid.shape
    src_dim = jnp.where(param == 0, _d32(state.input_dim), _d32(state.grid_dim))
    # Strictly-greater bound kept for reference parity (object.py:301).
    oob = (pre.rmax > src_dim[0]) | (pre.cmax > src_dim[1])
    valid = pre.any & ~oob
    h = pre.rmax - pre.rmin + 1
    w = pre.cmax - pre.cmin + 1
    src_sh = jnp.where(param == 0, shared.input_sh, shared.grid_sh)
    rows, cols = row_col_iota(H, W)
    win = (rows < h) & (cols < w)
    keep = win & (src_sh != 0) & shared.selp_sh
    new_clip = jnp.where(keep, src_sh, 0).astype(I8)
    new_dim = jnp.stack([h, w]).astype(I8)
    return state.replace(
        clip=jnp.where(valid, new_clip, state.clip),
        clip_dim=jnp.where(valid, new_dim, state.clip_dim),
    )


def paste_from_clip(state: EnvState, sel, pre, param, cfg, shared) -> EnvState:
    """Paste (object.py:316-349).  param != 0 selects paste_blank semantics
    (shipped default in both ARCEnv and O2ARCv2Env)."""
    H, W = state.grid.shape
    cd = _d32(state.clip_dim)
    h, w = cd[0], cd[1]
    valid = pre.any & (h != 0) & (w != 0)
    # clipped to the full HxW frame (input.shape), NOT to grid_dim
    vals, win = place_patch(
        state.clip, h, w, pre.rmin, pre.cmin,
        jnp.asarray(H, I32), jnp.asarray(W, I32))
    blank = param != 0
    write = win & valid & (blank | (vals != 0))
    grid = jnp.where(write, vals, state.grid)
    return state.replace(grid=grid)


# --------------------------------------------------------------------------
# The object-selection state machine (Move / Rotate / Flip)
# --------------------------------------------------------------------------
def _transform_buffer(buf: jax.Array, kind: jax.Array,
                      h: jax.Array, w: jax.Array,
                      kinds_present: frozenset) -> jax.Array:
    """Apply the object transform for ``kind`` to an origin-anchored h x w
    patch inside a full HxW buffer (zero outside the patch).

    The reference rotates/flips the dynamic-shape view ``buf[:h,:w]``
    (object.py:210-211,273-274).  With static shapes we transform the whole
    buffer and roll the result back to the origin; the zero invariant
    outside the patch makes this exact.
    """
    from ..core.geometry import dyn_roll
    H, W = buf.shape
    ident = buf
    # variants absent from the family's op table cost nothing
    mk = lambda k, f: f() if k in kinds_present else ident
    rot90 = mk(OBJ.ROT_90, lambda: dyn_roll(jnp.rot90(buf, k=1), w - W, 0))
    rot270 = mk(OBJ.ROT_270, lambda: dyn_roll(jnp.rot90(buf, k=3), h - H, 1))
    fliph = mk(OBJ.FLIP_H, lambda: dyn_roll(jnp.fliplr(buf), w - W, 1))
    flipv = mk(OBJ.FLIP_V, lambda: dyn_roll(jnp.flipud(buf), h - H, 0))
    flipd0 = mk(OBJ.FLIP_D0, lambda: buf.T)
    flipd1 = mk(OBJ.FLIP_D1, lambda: dyn_roll(
        dyn_roll(jnp.rot90(buf, k=2).T, w - W, 0), h - H, 1))
    return jax.lax.select_n(
        kind,
        ident, ident, ident, ident,      # moves keep the buffer
        rot90, rot270, fliph, flipv, flipd0, flipd1,
    )


def object_op(state: EnvState, sel, pre, param, cfg, shared) -> EnvState:
    """Move_U/D/R/L, Rotate_90/270, Flip_H/V/D0/D1 — the O2ARC object ops.

    Structure mirrors the reference exactly:
    ``_init_objsel`` (object.py:60-111) -> per-kind transform ->
    ``_apply_patch`` (113-138) -> ``_apply_sel`` (140-165).
    """
    H, W = state.grid.shape
    kind = param

    # ---- _init_objsel ----
    has_sel = pre.any
    cont = (~has_sel) & (state.active != 0)
    valid = has_sel | cont

    h_a = pre.rmax - pre.rmin + 1
    w_a = pre.cmax - pre.cmin + 1
    selp = shared.selp_sh
    rows, cols = row_col_iota(H, W)
    win_a = (rows < h_a) & (cols < w_a)
    obj_a = jnp.where(win_a & selp, shared.grid_sh, 0).astype(I8)
    osel_a = (win_a & selp).astype(I8)
    bg_a = jnp.where(sel != 0, 0, state.grid).astype(I8)

    obj = jnp.where(has_sel, obj_a, state.object)
    osel = jnp.where(has_sel, osel_a, state.object_sel)
    bg = jnp.where(has_sel, bg_a, state.background)
    x = jnp.where(has_sel, pre.rmin, _d32(state.object_pos)[0])
    y = jnp.where(has_sel, pre.cmin, _d32(state.object_pos)[1])
    h = jnp.where(has_sel, h_a, _d32(state.object_dim)[0])
    w = jnp.where(has_sel, w_a, _d32(state.object_dim)[1])
    parity = jnp.where(has_sel, 0, _d32(state.rotation_parity))

    # ---- per-kind transform ----
    is_move = kind <= OBJ.MOVE_L
    is_rot = (kind == OBJ.ROT_90) | (kind == OBJ.ROT_270)
    # Move deltas: U,D,R,L (object.py:227-228)
    dxs = jnp.asarray([-1, 1, 0, 0, 0, 0, 0, 0, 0, 0], I32)
    dys = jnp.asarray([0, 0, 1, -1, 0, 0, 0, 0, 0, 0], I32)
    x_move = x + dxs[kind]
    y_move = y + dys[kind]

    # Rotation position/parity arithmetic (object.py:186-207), done in
    # doubled integers so every division below is exact:
    #   same parity: pos' = (2x+h-w)//2, (2y+w-h)//2
    #   ill-posed  : parity' = (parity+k)%2, mod = 1-parity',
    #                pos' = (2x+h-w-1)//2 + mod, (2y+w-h-1)//2 + mod
    # (sig cancels inside the min(), so 90 and 270 share the formula)
    same_par = (h % 2) == (w % 2)
    parity_rot = jnp.where(same_par, parity, (parity + 1) % 2)
    mod = 1 - parity_rot
    x_rot = jnp.where(
        same_par,
        jnp.floor_divide(2 * x + h - w, 2),
        jnp.floor_divide(2 * x + h - w - 1, 2) + mod)
    y_rot = jnp.where(
        same_par,
        jnp.floor_divide(2 * y + w - h, 2),
        jnp.floor_divide(2 * y + w - h - 1, 2) + mod)

    x2 = jnp.where(is_move, x_move, jnp.where(is_rot, x_rot, x))
    y2 = jnp.where(is_move, y_move, jnp.where(is_rot, y_rot, y))
    h2 = jnp.where(is_rot, w, h)
    w2 = jnp.where(is_rot, h, w)
    parity2 = jnp.where(is_rot, parity_rot, parity)

    kinds_present = frozenset(
        p for g, p in zip(cfg.group, cfg.param) if g == G.OBJECT)
    obj2 = _transform_buffer(obj, kind, h, w, kinds_present)
    osel2 = _transform_buffer(osel, kind, h, w, kinds_present)

    # ---- _apply_patch ----
    gd = _d32(state.grid_dim)
    vals, pwin = place_patch(obj2, h2, w2, x2, y2, gd[0], gd[1])
    grid2 = jnp.where(pwin & (vals != 0), vals, bg)
    # ---- _apply_sel ----
    svals, swin = place_patch(osel2, h2, w2, x2, y2, gd[0], gd[1])
    sel2 = jnp.where(swin, svals, 0).astype(I8)

    pos2 = jnp.stack([x2, y2]).astype(I8)
    dim2 = jnp.stack([h2, w2]).astype(I8)
    pick = lambda a, b: jnp.where(valid, a, b)
    return state.replace(
        grid=pick(grid2, state.grid),
        selected=pick(sel2, state.selected),
        object=pick(obj2, state.object),
        object_sel=pick(osel2, state.object_sel),
        object_dim=pick(dim2, state.object_dim),
        object_pos=pick(pos2, state.object_pos),
        background=pick(bg, state.background),
        active=pick(jnp.ones((), I8), state.active),
        rotation_parity=pick(parity2.astype(I8), state.rotation_parity),
    )


# --------------------------------------------------------------------------
# Submit
# --------------------------------------------------------------------------
def answers_match(state: EnvState) -> jax.Array:
    """grid_dim == answer_dim and contents equal within the answer window."""
    H, W = state.grid.shape
    dims_eq = jnp.all(state.grid_dim == state.answer_dim)
    inside = inside_dims(state.answer_dim, H, W)
    content_eq = jnp.all(jnp.where(inside, state.grid == state.answer, True))
    return dims_eq & content_eq


def submit(state: EnvState, sel, pre, param, cfg, shared) -> EnvState:
    """base.py:172-183 with both reset_on_submit branches.

    ``state.reset_on_submit`` selects the branch; the per-family max_trial
    used to refill trials on reset_on_submit lives in the static cfg.
    """
    can = state.trials_remain != 0
    trials2 = jnp.where(can, state.trials_remain - jnp.asarray(1, I8),
                        state.trials_remain)
    submits2 = state.submit_count + can.astype(I32)
    match = shared.match
    term_after_check = jnp.where(can & match, jnp.asarray(1, I8),
                                 state.terminated)
    # plain path: trial exhaustion also terminates (base.py:182-183)
    term_plain = jnp.where(trials2 == 0, jnp.asarray(1, I8), term_after_check)
    plain = state.replace(
        trials_remain=trials2, submit_count=submits2, terminated=term_plain)

    # reset_on_submit path: init_state() replaces the whole state dict, so
    # the correctness flag and the exhaustion check both land on the
    # discarded old dict (base.py:179-183) — the surviving state is fresh.
    ros_active = can & (state.reset_on_submit != 0)
    from ..core.state import init_state as _fresh
    fresh = _fresh(state.input, state.input_dim, state.answer,
                   state.answer_dim, max_trial=jnp.asarray(cfg.max_trial, I8),
                   reset_on_submit=state.reset_on_submit)
    fresh = fresh.replace(
        steps=state.steps, submit_count=submits2,
        last_action_op=state.last_action_op, last_reward=state.last_reward)
    # !can with reset_on_submit still hits the exhaustion check on the live
    # dict, so reuse the plain path there.
    return jax.tree.map(
        lambda a, b: jnp.where(ros_active, a, b), fresh, plain)
