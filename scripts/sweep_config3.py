#!/usr/bin/env python
"""BASELINE config-3 batch sweep (round-4 verdict weak #6): measure the
ARC-27 + PointWrapper engine at 1024/2048/4096 envs on this v5e so the
>=1M steps/s @ v5p claim is extrapolation-backed by data rather than a
caveat.  Prints one JSON line consumed into BASELINE.md.
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import bench_tpu, log  # noqa: E402


def main():
    import jax
    cache = os.path.join(tempfile.gettempdir(),
                         f"arcle_bench_cache_{os.getuid()}")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from arcle_tpu.loaders.synthetic import write_corpus
    from arcle_tpu.loaders import ARCLoader
    from arcle_tpu.ops import arc_table

    with tempfile.TemporaryDirectory() as td:
        write_corpus(td, n_tasks=400, n_train=6, n_test=2)
        bank = ARCLoader(root=td).bank()

    out = {}
    for b in (1024, 2048, 4096):
        rate = bench_tpu(b, 100, 2, table=arc_table(max_trial=-1),
                         bank=bank, point_actions=True)
        out[f"arc_point_{b}env"] = round(rate)
        log(f"config3 B={b}: {rate:,.0f} steps/s")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
