"""TPU health canary for the axon-tunneled chip.

The tunneled v5e intermittently degrades (2-10x slow kernels, hangs,
FAILED_PRECONDITION) — perf numbers measured in a bad window are garbage.
Run this 10-second check before trusting any regression: the classic flash
forward at b=8 h=8 t=1024 d=64 bf16 reads ~0.86 ms when healthy (that
includes ~1.5 ms tunnel dispatch amortized over the loop). If it reads
>1.2 ms, wait 10-20 minutes and re-measure before drawing conclusions.

Note: `jax.block_until_ready` is a no-op on the tunneled backend — always
synchronize by fetching one element to host, as below.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from attention_models_tpu import sync  # noqa: E402
from attention_models_tpu.ops.flash_attention import flash_attention  # noqa: E402


def main() -> float:
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.standard_normal((8, 8, 1024, 64)), jnp.bfloat16)
    f = jax.jit(flash_attention)
    o = f(q, q, q)
    sync(o)  # real sync (block_until_ready is a no-op here)
    st = time.perf_counter()
    for _ in range(20):
        o = f(q, q, q)
    sync(o)
    ms = (time.perf_counter() - st) / 20 * 1e3
    verdict = "healthy" if ms < 1.2 else "DEGRADED — do not trust perf numbers"
    print(f"canary flash fwd: {ms:.2f} ms (healthy ~0.86) -> {verdict}")
    return ms


if __name__ == "__main__":
    main()
