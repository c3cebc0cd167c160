"""Per-part LM iteration cost on the attached device (VERDICT r4 item 4
diagnosis tool): times fori_loops of assemble / assemble+solve /
error-eval / full LM body at a given (N, M) capacity, so the
latency-bound share of each iteration is attributable.

Usage: python tools/ba_profile.py [N] [M]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/spt_jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from simplepanorama_tpu import ba


def make_problem(N, M, seed=0):
    rng = np.random.default_rng(seed)
    mi = rng.integers(0, N - 1, M).astype(np.int32)
    data = ba.BAData(
        mi=jnp.asarray(mi), mj=jnp.asarray((mi + 1).astype(np.int32)),
        q=jnp.asarray(rng.uniform(-300, 300, (M, 2)).astype(np.float32)),
        t=jnp.asarray(rng.uniform(-300, 300, (M, 2)).astype(np.float32)),
        m_valid=jnp.ones(M, bool))
    data = ba.with_pair_tables(data)
    cams = ba.CamState(
        focal=jnp.full((N,), 700.0), ppal=jnp.zeros((N, 2)),
        rotvec=jnp.asarray(
            rng.normal(0, 0.05, (N, 3)).astype(np.float32)).at[0].set(0.0),
        b=data.t)
    return cams, data, jnp.ones(N, bool)


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best


def measure_rtt():
    """One blocking dispatch on the attached device costs a flat round
    trip (~25 ms measured on the axon tunnel) that a timed(K-loop)/K
    microbenchmark smears as 25/K ms of phantom per-iteration latency;
    measure it so the report can subtract it."""
    x = jnp.zeros((8,), jnp.float32)
    f = jax.jit(lambda v: v * 1.0000001)
    jax.block_until_ready(f(x))
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(f(x))
        best = min(best, time.time() - t0)
    return best


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    M = int(sys.argv[2]) if len(sys.argv) > 2 else 20480
    K = 50
    cams, data, active = make_problem(N, M)
    active_m = data.m_valid & active[data.mi] & active[data.mj]

    @jax.jit
    def loop_assemble(cams, lam0):
        def body(i, acc):
            S, rhs, Vinv, W, eB = ba._assemble(
                cams, data, active_m, lam0 + i * 1e-6, active, False, N)
            return acc + S[0, 0] + rhs[0] + eB[0, 0]
        return jax.lax.fori_loop(0, K, body, 0.0)

    @jax.jit
    def loop_assemble_solve(cams, lam0):
        def body(i, acc):
            S, rhs, Vinv, W, eB = ba._assemble(
                cams, data, active_m, lam0 + i * 1e-6, active, False, N)
            da = ba._solve_preconditioned(S, rhs)
            wtd = (W * da[None, :, None]).sum(1)
            db = (Vinv * (eB - wtd)[:, None, :]).sum(2)
            return acc + da[0] + db[0, 0]
        return jax.lax.fori_loop(0, K, body, 0.0)

    @jax.jit
    def loop_error(cams, lam0):
        def body(i, acc):
            e = ba.total_error(
                cams._replace(focal=cams.focal + lam0 * 0 + i * 1e-9),
                data, active_m, False)
            return acc + e
        return jax.lax.fori_loop(0, K, body, 0.0)

    @jax.jit
    def loop_solve_only(S0, rhs0):
        def body(i, acc):
            da = ba._solve_preconditioned(S0 + i * 1e-9, rhs0)
            return acc + da[0]
        return jax.lax.fori_loop(0, K, body, 0.0)

    lam0 = jnp.float32(0.05)
    rtt = measure_rtt()
    t_as = (timed(loop_assemble, cams, lam0) - rtt) / K
    t_asv = (timed(loop_assemble_solve, cams, lam0) - rtt) / K
    t_er = (timed(loop_error, cams, lam0) - rtt) / K

    S0, rhs0, *_ = jax.jit(
        lambda c: ba._assemble(c, data, active_m, 0.05, active, False, N)
    )(cams)
    t_sv = (timed(loop_solve_only, S0, rhs0) - rtt) / K

    t_full = timed(
        lambda c: ba.lm_run(c, data, active, 0.05, fast=False,
                            max_iter=K), cams)
    res = ba.lm_run(cams, data, active, 0.05, fast=False, max_iter=K)
    n_iter = int(res.n_iter)

    print(f"N={N} M={M} (6N={6*N})")
    print(f"assemble           {t_as*1e3:8.3f} ms/iter")
    print(f"assemble+solve     {t_asv*1e3:8.3f} ms/iter "
          f"(solve+backsub ~{(t_asv-t_as)*1e3:.3f})")
    print(f"solve_only(dense)  {t_sv*1e3:8.3f} ms/iter")
    print(f"error eval         {t_er*1e3:8.3f} ms/iter")
    t_dev = max(t_full - rtt, 1e-9)
    print(f"full lm_run        {t_full*1e3:8.1f} ms for {n_iter} iters "
          f"-> {t_dev/max(1,n_iter)*1e3:.3f} ms/iter device, "
          f"{n_iter/t_dev:.0f} iters/s "
          f"(dispatch RTT {rtt*1e3:.1f} ms subtracted)")


if __name__ == "__main__":
    main()
