"""TPU gather cost model: how does per-row gather cost scale with row
count, row width, table size, and index locality?  Informs the round-2
shading design (attribute fetch, env sampling) — docs/PERF.md."""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def bench(name, fn, *args, reps=3):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(jax.jit(fn)(*args))
    print(f"{name:44s} {(time.time() - t0) / reps * 1e3:8.2f} ms",
          flush=True)
    return out


def main():
    R = 921600
    rng = np.random.default_rng(0)

    for T in (1 << 12, 1 << 17, 1 << 20):
        tab18 = jnp.asarray(rng.standard_normal((T, 18)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, T, R), jnp.int32)
        idx_sorted = jnp.sort(idx)
        for W in (1, 4, 18):
            tab = tab18[:, :W]
            bench(f"gather T={T:>8} W={W:>2} random",
                  lambda t, i: jax.lax.optimization_barrier(t[i]), tab, idx)
        bench(f"gather T={T:>8} W=18 sorted idx",
              lambda t, i: jax.lax.optimization_barrier(t[i]),
              tab18, idx_sorted)

    # one-hot matmul alternative for small tables
    for T in (8, 64, 512):
        tab = jnp.asarray(rng.standard_normal((T, 18)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, T, R), jnp.int32)
        bench(f"one-hot matmul T={T:>4} W=18",
              lambda t, i: jax.nn.one_hot(i, t.shape[0],
                                          dtype=jnp.float32) @ t,
              tab, idx)
        bench(f"plain gather   T={T:>4} W=18",
              lambda t, i: jax.lax.optimization_barrier(t[i]), tab, idx)

    # width-1 vs bundled: is cost per ROW or per element?
    T = 1 << 17
    tab = jnp.asarray(rng.standard_normal((T, 18)), jnp.float32)
    idx4 = jnp.asarray(rng.integers(0, T, (R, 4)), jnp.int32)
    bench("4 separate W=18 gathers (4 ops)",
          lambda t, i: jax.lax.optimization_barrier(
              tuple(t[i[:, k]] for k in range(4))), tab, idx4)
    bench("1 gather of (R*4,) flat idx",
          lambda t, i: jax.lax.optimization_barrier(t[i.reshape(-1)]),
          tab, idx4)

    # int32 vs int16-ish index dtype / take_along axis form
    flat = tab.reshape(-1)
    idxf = jnp.asarray(rng.integers(0, T * 18, R), jnp.int32)
    bench("scalar-table W=1 flat gather",
          lambda t, i: jax.lax.optimization_barrier(t[i]), flat, idxf)


if __name__ == "__main__":
    main()
