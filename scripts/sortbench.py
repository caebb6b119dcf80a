"""Price the secondary-wave ray sort on the real TPU (chained loops):
global bitonic argsort vs block-local sort (sort_rays_morton block=) at
720p and 4K wave sizes, plus the bundled apply/unapply gathers.

Usage: python scripts/sortbench.py [iters]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402
enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def chain(fn, args, iters):
    @jax.jit
    def run(*a):
        def body(i, acc):
            r = fn(*a, acc)
            return jnp.sum(r[0].astype(jnp.float32) if isinstance(r, tuple)
                           else r.astype(jnp.float32)) * 1e-30

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    np.asarray(run(*args))
    t0 = time.time()
    np.asarray(run(*args))
    return (time.time() - t0) / iters * 1e3


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from raytracedggx_tpu.ops.traverse_pallas import sort_rays_morton

    for R, tag in ((1280 * 720, "720p"), (3840 * 2160, "4k")):
        rng = np.random.default_rng(3)
        o = jnp.asarray(rng.uniform(0, 1, (R, 3)).astype(np.float32))
        d = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
        act = jnp.asarray(rng.uniform(size=R) > 0.9)
        lo, hi = jnp.zeros(3), jnp.ones(3)

        for blk in (None, 4096, 16384):
            def f(o, d, act, acc):
                order, inv = sort_rays_morton(o + acc, d, lo, hi,
                                              active=act, block=blk)
                return order

            ms = chain(f, (o, d, act), iters)
            print(f"{tag} sort block={str(blk):6s} {ms:8.2f} ms",
                  flush=True)

        def apply_g(o, d, act, acc):
            order, inv = sort_rays_morton(o + acc, d, lo, hi, active=act)
            bundle = jnp.concatenate([o, d], axis=-1)[order]
            return bundle[inv]

        ms = chain(apply_g, (o, d, act), iters)
        print(f"{tag} sort+apply+unapply    {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
