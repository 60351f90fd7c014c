"""Drop-in Gymnasium adapters over the functional JAX cores.

A user of the reference package can switch imports and keep their code:
``RawARCEnv``, ``ARCEnv``, ``O2ARCv2Env`` expose the same constructor
signature (base.py:37-43), observation/action spaces (base.py:121-138,
o2arcenv.py:36-74), reset options (base.py:87-93), info dict
(base.py:145-153), sparse reward and ANSI rendering as the reference —
backed by the jit-compiled engine instead of in-place numpy mutation.

Divergence (documented): unseeded task sampling uses the env's Gymnasium
``np_random`` instead of the reference's *global* numpy RNG
(base.py:99,104; loader.py:51) — the reference never honors its own seed,
which we consider a bug not worth reproducing.  Parity tests pin explicit
indices so this never affects bit-exactness checks.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np
from gymnasium import spaces

from ..core.state import EnvState, Action, init_state
from ..loaders import Loader, ARCLoader
from ..ops.table import OpTable, raw_table, arc_table, o2arc_table, step
from ..utils.render import render_ansi_core, render_ansi_o2

# One compiled step per op table, shared by every adapter instance.
_JIT_STEP = jax.jit(step, static_argnums=2)


class JaxARCEnvBase(gym.Env):
    """Common adapter machinery (counterpart of AbstractARCEnv)."""

    metadata = {"render_modes": ["ansi"], "render_fps": 5}
    _obs_keys: Tuple[str, ...] = ()

    def __init__(self, data_loader: Optional[Loader] = None,
                 max_grid_size: Tuple[int, int] = (30, 30),
                 colors: int = 10, max_trial: int = -1,
                 render_mode: Optional[str] = None,
                 render_size: Optional[Tuple[int, int]] = None,
                 backend: str = "auto") -> None:
        assert render_mode is None or render_mode in self.metadata["render_modes"]
        # The engine's whole-grid kernels assume square frames (the
        # reference's own envs/datasets only ever use square sizes).
        assert max_grid_size[0] == max_grid_size[1], (
            "arcle_tpu supports square max_grid_size only")
        assert backend in ("auto", "native", "jax")
        self.loader = data_loader if data_loader is not None else ARCLoader()
        self.H, self.W = max_grid_size
        self.max_grid_size = max_grid_size
        self.colors = colors
        self.max_trial = max_trial
        self.render_mode = render_mode
        self.render_size = render_size
        self.rendering = None

        self.table = self._make_table(max_trial)
        # Interactive B=1 stepping is dispatch-bound on an accelerator
        # (~ms per step round-trip); the native C++ engine (bit-exact vs
        # the oracle/reference, tests/test_native_engine.py) steps at
        # ~70k steps/s.  "auto" uses it whenever the toolchain builds it;
        # backend="jax" forces device stepping (e.g. for subclasses that
        # reach into EnvState internals).
        self._native = None
        if backend != "jax" and self.H <= 30 and self.W <= 30:
            from ..native import NativeEngine, engine_available
            if engine_available():
                self._native = NativeEngine(self.table, self.H, self.W,
                                            max_trial)
            elif backend == "native":
                raise RuntimeError("native engine unavailable")
        self.op_names: List[str] = list(self.table.op_names())
        # reference exposes `operations` as the op list; wrappers only use
        # its length, so names stand in for the closures here.
        self.operations = self.op_names

        self.observation_space = self.create_state_space()
        self.action_space = self.create_action_space(self.table.n_ops)

        self._state: Optional[EnvState] = None
        self.last_action: Optional[Dict] = None
        self.last_action_op: Optional[int] = None
        self.last_reward: float = 0.0
        self.action_steps: int = 0
        self.submit_count: int = 0
        self.truncated = False
        self.input_: Optional[np.ndarray] = None
        self.answer: Optional[np.ndarray] = None
        self.description: Dict = {}

    @property
    def current_state(self) -> Dict:
        """The full observation dict (the reference exposes the mutable
        state dict as ``current_state``, base.py:24; here it is a read-only
        snapshot)."""
        return self._observation()

    # ---- reference-parity construction hooks ----
    def _make_table(self, max_trial: int) -> OpTable:
        raise NotImplementedError

    def create_state_space(self) -> spaces.Dict:
        return spaces.Dict({
            "trials_remain": spaces.Box(-1, self.max_trial, shape=(1,),
                                        dtype=np.int8),
            "terminated": spaces.MultiBinary(1),
            "input": spaces.Box(0, self.colors, (self.H, self.W),
                                dtype=np.int8),
            "input_dim": spaces.Box(low=np.array([1, 1]),
                                    high=np.array([self.H, self.W]),
                                    dtype=np.int8),
            "grid": spaces.Box(0, self.colors, (self.H, self.W),
                               dtype=np.int8),
            "grid_dim": spaces.Box(low=np.array([1, 1]),
                                   high=np.array([self.H, self.W]),
                                   dtype=np.int8),
        })

    def create_action_space(self, action_count: int) -> spaces.Dict:
        return spaces.Dict({
            "selection": spaces.Box(0, 1, (self.H, self.W), dtype=np.int8),
            "operation": spaces.Discrete(action_count),
        })

    # ---- gym API ----
    def reset(self, seed: Optional[int] = None,
              options: Optional[Dict] = None):
        super().reset(seed=seed, options=options)
        self.truncated = False
        self.submit_count = 0
        self.last_action = None
        self.last_action_op = None
        self.last_reward = 0.0
        self.action_steps = 0

        self.prob_index = None
        self.subprob_index = None
        self.adaptation = True
        self.reset_on_submit = False
        self.options = options
        if options is not None:
            self.prob_index = options.get("prob_index")
            self.subprob_index = options.get("subprob_index")
            ad = options.get("adaptation")
            self.adaptation = True if ad is None else bool(ad)
            ros = options.get("reset_on_submit")
            self.reset_on_submit = False if ros is None else ros

        ex_in, ex_out, tt_in, tt_out, desc = self.loader.pick(
            data_index=self.prob_index)
        pool_in, pool_out = (ex_in, ex_out) if self.adaptation else (tt_in, tt_out)
        if self.subprob_index is None:
            self.subprob_index = int(self.np_random.integers(0, len(pool_in)))
        self.input_ = pool_in[self.subprob_index]
        self.answer = pool_out[self.subprob_index]
        self.description = desc

        self._state = self._fresh_state()
        if self.render_mode:
            self.render()
        self.info = self.init_info()
        return self._observation(), self.info

    def _fresh_state(self) -> Optional[EnvState]:
        if self._native is not None:
            self._native.reset(self.input_, self.answer,
                               reset_on_submit=bool(self.reset_on_submit))
            return None
        pi = np.zeros((self.H, self.W), np.int8)
        pi[:self.input_.shape[0], :self.input_.shape[1]] = self.input_
        pa = np.zeros((self.H, self.W), np.int8)
        pa[:self.answer.shape[0], :self.answer.shape[1]] = self.answer
        return init_state(
            jnp.asarray(pi), jnp.asarray(np.array(self.input_.shape, np.int8)),
            jnp.asarray(pa), jnp.asarray(np.array(self.answer.shape, np.int8)),
            max_trial=self.max_trial,
            reset_on_submit=int(self.reset_on_submit))

    def init_info(self) -> Dict:
        isize = self.input_.shape
        osize = self.answer.shape
        info = {
            "input": np.pad(self.input_, [(0, self.H - isize[0]),
                                          (0, self.W - isize[1])]),
            "input_dim": isize,
            "answer": np.pad(self.answer, [(0, self.H - osize[0]),
                                           (0, self.W - osize[1])]),
            "answer_dim": osize,
            "steps": 0,
        }
        return info

    def step(self, action: Dict):
        op = int(action["operation"])
        if self._native is not None:
            reward, term = self._native.step(
                np.asarray(action["selection"], np.int8), op)
            self.last_action = action
            self.last_action_op = op
            self.last_reward = reward
            self.action_steps += 1
            self.submit_count = int(self._native._st.submit_count)
            self.info["steps"] = self.action_steps
            if "submit_count" in self.info:
                self.info["submit_count"] = self.submit_count
            if self.render_mode:
                self.render()
            return (self._observation(), reward, bool(term),
                    self.truncated, self.info)
        act = Action(selection=jnp.asarray(action["selection"], jnp.int8),
                     operation=jnp.asarray(op, jnp.int32))
        self._state, reward, term = _JIT_STEP(self._state, act, self.table)
        reward = float(reward)
        self.last_action = action
        self.last_action_op = op
        self.last_reward = reward
        self.action_steps += 1
        self.submit_count = int(self._state.submit_count)
        self.info["steps"] = self.action_steps
        if "submit_count" in self.info:
            self.info["submit_count"] = self.submit_count
        if self.render_mode:
            self.render()
        return (self._observation(), reward, bool(term), self.truncated,
                self.info)

    # ---- observation marshalling ----
    def _np(self, x) -> np.ndarray:
        return np.asarray(x)

    def _observation(self) -> Dict:
        if self._native is not None:
            # zero-copy views over the engine state — the reference's
            # current_state aliases its mutable dict the same way
            return self._native.observation(self._obs_keys)
        s = self._state
        obs = {
            "trials_remain": self._np(s.trials_remain).reshape(1),
            "terminated": self._np(s.terminated).reshape(1),
            "input": self._np(s.input),
            "input_dim": self._np(s.input_dim),
            "grid": self._np(s.grid),
            "grid_dim": self._np(s.grid_dim),
        }
        if "clip" in self._obs_keys:
            obs["clip"] = self._np(s.clip)
            obs["clip_dim"] = self._np(s.clip_dim)
        if "selected" in self._obs_keys:
            obs["selected"] = self._np(s.selected)
            obs["object_states"] = {
                "active": self._np(s.active).reshape(1),
                "object": self._np(s.object),
                "object_sel": self._np(s.object_sel),
                "object_dim": self._np(s.object_dim),
                "object_pos": self._np(s.object_pos),
                "background": self._np(s.background),
                "rotation_parity": self._np(s.rotation_parity).reshape(1),
            }
        return obs

    # ---- rendering ----
    def render(self):
        if self.render_mode == "ansi":
            self.render_ansi()

    def render_ansi(self):
        first = self.rendering is None
        self.rendering = True
        op_name = (self.op_names[self.last_action_op]
                   if self.last_action_op is not None else "")
        render_ansi_core(self._observation(), self.description, op_name,
                         self.last_reward, first=first)


class RawARCEnv(JaxARCEnvBase):
    """12-op env (arcenv.py:16-76)."""

    _obs_keys = ()

    def __init__(self, data_loader: Optional[Loader] = None,
                 max_grid_size=(30, 30), colors=10, max_trial=-1,
                 render_mode=None, render_size=None, backend="auto"):
        super().__init__(data_loader, max_grid_size, colors, max_trial,
                         render_mode, render_size, backend)

    def _make_table(self, max_trial: int) -> OpTable:
        return raw_table(max_trial)


class ARCEnv(JaxARCEnvBase):
    """27-op testing-interface env (arcenv.py:78-217; the reference's
    [None]*35 construction crash and len(ops)-1 reward index are fixed to
    the documented 27-op intent, see SURVEY.md §2.1 #4)."""

    _obs_keys = ("clip",)

    def __init__(self, data_loader: Optional[Loader] = None,
                 max_grid_size=(30, 30), colors=10, max_trial=3,
                 render_mode=None, render_size=None, backend="auto"):
        super().__init__(data_loader, max_grid_size, colors, max_trial,
                         render_mode, render_size, backend)

    def _make_table(self, max_trial: int) -> OpTable:
        return arc_table(max_trial)

    def create_state_space(self):
        sp = dict(super().create_state_space().spaces)
        sp["clip"] = spaces.Box(0, self.colors, (self.H, self.W),
                                dtype=np.int8)
        sp["clip_dim"] = spaces.Box(low=np.array([0, 0]),
                                    high=np.array([self.H, self.W]),
                                    dtype=np.int8)
        return spaces.Dict(sp)

    def init_info(self) -> Dict:
        info = super().init_info()
        info["submit_count"] = 0
        return info


class O2ARCv2Env(JaxARCEnvBase):
    """Full 35-op O2ARC interface env (o2arcenv.py:13-193)."""

    _obs_keys = ("clip", "selected")

    def __init__(self, data_loader: Optional[Loader] = None,
                 max_grid_size=(30, 30), colors=10, max_trial=-1,
                 render_mode=None, render_size=None, backend="auto"):
        super().__init__(data_loader, max_grid_size, colors, max_trial,
                         render_mode, render_size, backend)

    def _make_table(self, max_trial: int) -> OpTable:
        return o2arc_table(max_trial)

    def create_state_space(self):
        sp = dict(super().create_state_space().spaces)
        sp.update({
            "selected": spaces.Box(0, 1, (self.H, self.W), dtype=np.int8),
            "clip": spaces.Box(0, self.colors, (self.H, self.W),
                               dtype=np.int8),
            "clip_dim": spaces.Box(low=np.array([0, 0]),
                                   high=np.array([self.H, self.W]),
                                   dtype=np.int8),
            "object_states": spaces.Dict({
                "active": spaces.MultiBinary(1),
                "object": spaces.Box(0, self.colors, (self.H, self.W),
                                     dtype=np.int8),
                "object_sel": spaces.Box(0, 1, (self.H, self.W),
                                         dtype=np.int8),
                "object_dim": spaces.Box(low=np.array([0, 0]),
                                         high=np.array([self.H, self.W]),
                                         dtype=np.int8),
                "object_pos": spaces.Box(low=np.array([-128, -128]),
                                         high=np.array([127, 127]),
                                         dtype=np.int8),
                "background": spaces.Box(0, self.colors, (self.H, self.W),
                                         dtype=np.int8),
                "rotation_parity": spaces.MultiBinary(1),
            }),
        })
        return spaces.Dict(sp)

    def init_info(self) -> Dict:
        info = super().init_info()
        info["submit_count"] = 0
        return info

    def render_ansi(self):
        first = self.rendering is None
        self.rendering = True
        op_name = (self.op_names[self.last_action_op]
                   if self.last_action_op is not None else "")
        sel_flag = (self.last_action is not None
                    and bool(np.any(self.last_action["selection"])))
        render_ansi_o2(self._observation(), self.description, op_name,
                       self.last_reward, sel_flag, first=first)


class O2ARCNoFillEnv(O2ARCv2Env):
    """O2ARC minus the FloodFill ops (agents/wrapper.py:53-57)."""

    def _make_table(self, max_trial: int) -> OpTable:
        return o2arc_table(max_trial, no_fill=True)
