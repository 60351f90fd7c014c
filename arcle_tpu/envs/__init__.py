"""Environment layer: functional cores, batched engine, gym adapters.

Gymnasium IDs mirror the reference registrations
(/root/reference/arcle/envs/__init__.py:7-25) so ``gym.make`` call sites
keep working, plus the NoFill variant (agents/wrapper.py:61-65).
"""

from .core import (
    reset, step, transition, ResetOptions, BatchedEnv, BatchedState,
    batched_reset, batched_step, reset_jit,
)
from .gym_compat import (
    JaxARCEnvBase, RawARCEnv, ARCEnv, O2ARCv2Env, O2ARCNoFillEnv,
)
from .meta import CustomO2ARCEnv, augment_task

from gymnasium.envs.registration import register, registry

_SPECS = [
    ("ARCLE/RawARCEnv-v0", "arcle_tpu.envs.gym_compat:RawARCEnv", None),
    ("ARCLE/ARCEnv-v0", "arcle_tpu.envs.gym_compat:ARCEnv", None),
    ("ARCLE/O2ARCEnv-v2", "arcle_tpu.envs.gym_compat:O2ARCv2Env", None),
    ("ARCLE/O2ARCv2Env-v0", "arcle_tpu.envs.gym_compat:O2ARCv2Env", None),
    ("ARCLE/O2ARCNoFillEnv", "arcle_tpu.envs.gym_compat:O2ARCNoFillEnv", 300),
    ("ARCLE/CustomO2ARCEnv-v0", "arcle_tpu.envs.meta:CustomO2ARCEnv", None),
]
for _id, _ep, _steps in _SPECS:
    # compat IDs (may be shadowed if the original arcle package is also
    # installed and registers after us) ...
    if _id not in registry:
        register(id=_id, entry_point=_ep, max_episode_steps=_steps)
    # ... plus an unambiguous namespace that always points here.
    _tpu_id = _id.replace("ARCLE/", "ARCLE-TPU/")
    if _tpu_id not in registry:
        register(id=_tpu_id, entry_point=_ep, max_episode_steps=_steps)

__all__ = [
    "reset", "step", "transition", "ResetOptions", "BatchedEnv",
    "BatchedState", "batched_reset", "batched_step", "reset_jit",
    "JaxARCEnvBase", "RawARCEnv", "ARCEnv", "O2ARCv2Env",
    "O2ARCNoFillEnv", "CustomO2ARCEnv", "augment_task",
]
