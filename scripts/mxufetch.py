"""Price the independent-lane traversal's fetch primitive (VERDICT r4
item 2a): per-lane node fetch via one-hot matmul against a VMEM-resident
node table.

An independent-lane kernel needs, per traversal STEP, each of the 1024
lanes to read ITS OWN node row (32 floats) from an (N, 32) table — on
TPU the only vectorizable form is one_hot(idx, N) @ table (no per-lane
dynamic gather exists in Pallas/Mosaic; pallas_guide.md).  This measures
that step's cost inside a chained XLA loop at the wave's real scale:
(R, N) one-hot construction + (R, N) @ (N, 32) matmul, R = 237568 (the
bucket wave @720p).

The verdict threshold: the production packet kernel's reflection wave
costs ~16 ms for ~150k live rays.  An independent-lane formulation needs
mean-per-ray-visits (measured by scripts/unionstats.py, typically 30-60
node steps) x step cost to beat it.

Usage: python scripts/mxufetch.py [R] [steps]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def time_steps(R, N, steps):
    table = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (N, 32)).astype(np.float32))
    idx0 = jnp.asarray(np.random.default_rng(1).integers(
        0, N, R).astype(np.int32))

    @jax.jit
    def chain(idx):
        def body(_, carry):
            idx, acc = carry
            oh = jax.nn.one_hot(idx, N, dtype=jnp.bfloat16)
            row = jnp.dot(oh, table.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)  # (R, 32)
            # derive the next per-lane index from the fetch (keeps the
            # chain carry-dependent so XLA cannot hoist it)
            nxt = (jnp.abs(row[:, 0]) * 7.0).astype(jnp.int32) % N
            return (nxt, acc + row[:, 1].sum() * 1e-30)

        idx, acc = jax.lax.fori_loop(0, steps, body, (idx, jnp.float32(0)))
        return acc + idx.sum() * 1e-30

    np.asarray(chain(idx0))          # compile + warm
    t0 = time.time()
    np.asarray(chain(idx0))
    dt = (time.time() - t0) / steps
    return dt


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 237568
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    for N in (512, 1024, 2048, 4096):
        dt = time_steps(R, N, steps)
        # flops of the matmul alone
        gf = 2 * R * N * 32 / dt / 1e9
        print(f"N={N:5d}: {dt * 1e3:7.3f} ms/step for {R} lanes "
              f"({dt / R * 1e9:6.2f} ns/lane-fetch, {gf:7.0f} GF/s)",
              flush=True)
    print("\nverdict math: total = steps_per_ray x ms/step; the packet "
          "kernel's whole reflection wave is ~16 ms @720p.")


if __name__ == "__main__":
    main()
