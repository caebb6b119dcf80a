"""Reproduce + price the gather layout pathology (round 3, xplane trace):
the production quad gathers run at ~4-6 ns/row because XLA assigns the
table (or the gather output) a COLUMN-major {0,1} layout — each logical
row fetch/store becomes C strided accesses — while the identical gather
against a row-major operand measures ~0.2-0.3 ms (scripts/
bench_gather.py).  Prices launder variants that pin row-major physical
order.  Usage: python scripts/layoutbench.py [iters]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

R = 921600
H, W = 720, 1280


def chain(name, fn, *args, iters=10):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            out = fn(*a, acc)
            return jnp.sum(out) * 1e-30

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    np.asarray(loop(*args))
    t0 = time.time()
    np.asarray(loop(*args))
    ms = (time.time() - t0) / iters * 1e3
    print(f"{name:56s} {ms:8.2f} ms", flush=True)
    return ms


def launder(x):
    """Force a row-major physical copy: reshape to 1-D (single possible
    layout) behind an optimization barrier, reshape back (bitcast)."""
    flat = jax.lax.optimization_barrier(x.reshape(-1))
    return flat.reshape(x.shape)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    rng = np.random.default_rng(0)
    hist = jnp.asarray(rng.standard_normal((H, W, 4)), jnp.float32)
    # near-identity indices like the TAA resample
    idx = jnp.clip(jnp.arange(R) + jnp.asarray(
        rng.integers(-W, W, R), jnp.int32), 0, R - 1)

    def build_quad(h):
        right = jnp.concatenate([h[:, 1:], h[:, -1:]], axis=1)
        row0 = jnp.concatenate([h, right], axis=-1)
        quad = jnp.concatenate(
            [row0, jnp.concatenate([row0[1:], row0[-1:]], axis=0)],
            axis=-1)
        return quad.reshape(H * W, 16)

    def consume(q16, s):
        # production-like consumer: channel slices + weighted sum into an
        # image-shaped output
        out = (q16[:, 0:4] * 0.25 + q16[:, 4:8] * 0.25
               + q16[:, 8:12] * 0.25 + q16[:, 12:16] * 0.25)
        return out.reshape(H, W, 4) + s

    chain("in-graph quad + row gather (production shape)",
          lambda h, i, s: consume(build_quad(h + s)[i], 0.0),
          hist, idx, iters=iters)
    chain("in-graph quad LAUNDERED + row gather",
          lambda h, i, s: consume(launder(build_quad(h + s))[i], 0.0),
          hist, idx, iters=iters)
    chain("in-graph quad + gather, output LAUNDERED",
          lambda h, i, s: consume(
              launder(jax.lax.optimization_barrier(
                  build_quad(h + s)[i])), 0.0),
          hist, idx, iters=iters)
    chain("both laundered",
          lambda h, i, s: consume(
              launder(launder(build_quad(h + s))[i]), 0.0),
          hist, idx, iters=iters)

    # materialized row-major table baseline
    quad_mat = jnp.asarray(
        np.asarray(rng.standard_normal((H * W, 16))), jnp.float32)
    chain("materialized table + row gather (baseline)",
          lambda q, i, s: consume(q[i] + s, 0.0), quad_mat, idx,
          iters=iters)

    # env-shaped: (524286, 12) captured-constant table
    env_quad = jnp.asarray(
        np.asarray(rng.standard_normal((524286, 12))), jnp.float32)
    eidx = jnp.asarray(rng.integers(0, 524286, R), jnp.int32)

    def env_consume(q, s):
        out = q[:, 0:3] * 0.2 + q[:, 3:6] * 0.3 + q[:, 6:9] * 0.1 \
            + q[:, 9:12] * 0.4
        return out + s

    chain("captured env table + gather + slice-weights",
          lambda i, s: env_consume(env_quad[i], 0.0), eidx, iters=iters)
    chain("captured env table LAUNDERED + gather",
          lambda i, s: env_consume(launder(env_quad)[i], 0.0), eidx,
          iters=iters)
    chain("captured env gather output LAUNDERED",
          lambda i, s: env_consume(
              launder(jax.lax.optimization_barrier(env_quad[i])), 0.0),
          eidx, iters=iters)


if __name__ == "__main__":
    main()
