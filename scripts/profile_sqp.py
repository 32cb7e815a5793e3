"""On-chip stage breakdown of the batch-level LBMPC SQP at batch 8192.

Times the three phases separately (each as its own jit):
  jac    — vmapped residual Jacobian (jacfwd through the learned rollout)
  qp     — one fused QP subproblem (ipm_iters Mehrotra iterations)
  merit  — the 6 merit evaluations of the Armijo ladder (6 learned rollouts)

The full solver runs sqp_iters * (jac + qp + merit); comparing the sum
against the measured whole-solver time shows the fusion headroom.
"""

import dataclasses
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).parent.parent / ".cache" / "jax"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lbmpc_tpu.config import make_preset
    from lbmpc_tpu.controllers.condensed import build_fmincon_lmpc
    from lbmpc_tpu.controllers.lbmpc import LBMPCWeights
    from lbmpc_tpu.models.mgcm import mgcm_dlti
    from lbmpc_tpu.oracle import init_window, make_xi, nw_estimate
    from lbmpc_tpu.ops.ipm_fused import build_fused_qp_solver
    from lbmpc_tpu.sets.terminal import get_cons_poly
    from lbmpc_tpu.synthesis import mat_ocp

    N, q, batch = 20, 100, 8192
    cfg = make_preset("LBMPC_N40")
    p = cfg.plant
    A, B, C, _ = mgcm_dlti(p.ts)
    ocp = mat_ocp(A, B, C, poles=cfg.ocp.poles, T=cfg.ocp.T)
    cs = get_cons_poly(
        x_min=p.x_min, x_max=p.x_max, u_min=p.u_min, u_max=p.u_max,
        x_wp=p.x_wp, u_wp=p.u_wp, state_uncert=p.state_uncert,
        A=A, B=B, Q=ocp.Q, R=ocp.R,
        LAMBDA=ocp.LAMBDA, PSI=ocp.PSI, LAMBDA_0=ocp.LAMBDA_0, PSI_0=ocp.PSI_0,
    )
    qp = build_fmincon_lmpc(
        A, B, ocp.Ks, ocp.Q, ocp.R, ocp.P, ocp.T, ocp.LAMBDA, ocp.PSI, cs, N,
        dx_ref=np.asarray(cfg.dx_ref), terminal_at=cfg.ocp.terminal_at,
        tighten_first_step=cfg.ocp.tighten_first_step,
    )
    w = LBMPCWeights.make(ocp.Q, ocp.R, ocp.P, ocp.T, ocp.LAMBDA, ocp.PSI)

    f32 = jnp.float32
    Ad, Bd = jnp.asarray(A, f32), jnp.asarray(B, f32)
    Ksd = jnp.asarray(np.atleast_2d(ocp.Ks), f32)
    Lq, Lr, Lp = jnp.asarray(w.Lq, f32), jnp.asarray(w.Lr, f32), jnp.asarray(w.Lp, f32)
    LAM, PSI = jnp.asarray(w.LAMBDA, f32), jnp.asarray(w.PSI, f32)
    Gd = jnp.asarray(qp.G, f32)
    h0d = jnp.asarray(qp.h0, f32)
    Hpd = jnp.asarray(qp.Hp, f32)
    xs_ref = jnp.zeros((4,), f32)
    n, m = 4, 1

    def residual_single(z, dx0, window):
        cs_ = z[: N * m].reshape(N, m)
        theta = z[N * m:]

        def step(x, c):
            u = Ksd @ x + c
            x1 = Ad @ x + Bd @ u + nw_estimate(make_xi(x, u), window, 0.5, 0.001)
            return x1, (x, u)

        xN, (xs, us) = jax.lax.scan(step, dx0, cs_)
        xa, ua = LAM @ theta, PSI @ theta
        rx = (xs[: N - 2] - xa) @ Lq.T
        ru = (us[: N - 2] - ua) @ Lr.T
        rP = Lp @ (xN - xa)
        rT = w.sqrtT * (xa - xs_ref)
        return jnp.concatenate([rx.ravel(), ru.ravel(), rP, rT])

    res_b = jax.vmap(residual_single, in_axes=(0, 0, 0))
    jac_b = jax.vmap(jax.jacfwd(residual_single), in_axes=(0, 0, 0))
    fused = build_fused_qp_solver(None, qp.G, iters=20, tile=512)

    rng = np.random.default_rng(0)
    dx = jnp.asarray(np.array([-0.35, -0.4, 0.0, 0.0]) + 0.01 * rng.standard_normal((batch, 4)), f32)
    window = init_window(q, dtype=f32)
    windows = type(window)(
        X=jnp.asarray(0.1 * rng.standard_normal((batch, q, 3)), f32),
        Y=jnp.asarray(0.001 * rng.standard_normal((batch, q, 4)), f32),
        valid=jnp.ones((batch, q), f32),
        count=jnp.full((batch,), q, jnp.int32),
    )
    z = jnp.zeros((batch, qp.nz), f32)
    h = h0d[None, :] + dx @ Hpd.T

    @jax.jit
    def phase_jac(z):
        with jax.enable_x64(False), jax.default_matmul_precision("highest"):
            e = res_b(z, dx, windows)
            J = jac_b(z, dx, windows)
            Hb = 2.0 * jnp.einsum("bei,bej->bij", J, J, precision=jax.lax.Precision.HIGHEST)
            gb = 2.0 * jnp.einsum("bei,be->bi", J, e, precision=jax.lax.Precision.HIGHEST)
            return Hb, gb

    @jax.jit
    def phase_jac_scalar(z):
        Hb, gb = phase_jac(z)
        return jnp.sum(Hb) + jnp.sum(gb)  # scalar: keeps the tunnel transfer out of the timing

    Hb, gb = phase_jac(z)

    @jax.jit
    def phase_merit(z):
        with jax.enable_x64(False), jax.default_matmul_precision("highest"):
            tot = jnp.zeros((batch,), f32)
            for a in (1.0, 0.5, 0.25, 0.125, 0.0625, 0.0):
                e = res_b(z + a, dx, windows)
                viol = jnp.sum(jnp.maximum((z + a) @ Gd.T - h, 0.0), axis=1)
                tot = tot + jnp.sum(e * e, axis=1) + viol
            return tot

    @jax.jit
    def qp_scalar():
        sub = fused.solve_with_H(Hb, gb, h - z @ Gd.T)
        return jnp.sum(sub.x)

    def force(out):
        leaf = out[0] if isinstance(out, tuple) else out
        return float(np.asarray(leaf).ravel()[0])

    phases = {
        "jac+hess": lambda: phase_jac_scalar(z),
        "qp_fused": qp_scalar,
        "merit_ladder6": lambda: jnp.sum(phase_merit(z)),
    }
    out = {}
    for name, fn in phases.items():
        force(fn())
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            force(fn())
            ts.append(time.perf_counter() - t0)
        out[name] = round(float(np.median(ts)) * 1e3, 2)
        print(json.dumps({name: out[name]}), flush=True)

    est = 3 * (out["jac+hess"] + out["qp_fused"] + out["merit_ladder6"])
    print(json.dumps({"sum_x3_ms": round(est, 1), "measured_full_ms": 122.6,
                      "batch": batch}))


if __name__ == "__main__":
    main()
