"""Numeric unit tests for the integrator core (SURVEY.md §4 test plan):

- RK4 order-of-convergence on a nonlinear problem with known solution.
- DOPRI5 dense output matches analytic solutions to the rtol=1e-5 bar
  (the reference's solver accuracy setting, mode_sep/config.py:27-29).
- Adjoint gradients agree with checkpointed backprop-through-RK4 gradients.
- Euler–Maruyama statistics on a linear SDE (Ornstein–Uhlenbeck moments).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ananke_abm_tpu.ode import (
    dopri5_solve,
    euler_maruyama_solve,
    odeint_adjoint,
    rk4_solve,
)

jax.config.update("jax_enable_x64", False)


def _logistic_rhs(t, y, args):
    r = args["r"]
    return r * y * (1.0 - y)


def _logistic_exact(t, y0, r):
    return 1.0 / (1.0 + (1.0 / y0 - 1.0) * np.exp(-r * t))


class TestRK4:
    def test_convergence_order(self):
        """Halving the step size should reduce error ~16x (4th order)."""
        y0 = jnp.array([0.1], dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
        ts = jnp.array([0.0, 2.0])
        args = {"r": jnp.asarray(1.7)}
        exact = _logistic_exact(2.0, 0.1, 1.7)

        errs = []
        for substeps in (8, 16, 32):
            ys = rk4_solve(_logistic_rhs, y0, ts, args, substeps=substeps)
            errs.append(abs(float(ys[-1][0]) - exact))
        # observed order = log2(err ratio)
        order1 = np.log2(errs[0] / errs[1])
        order2 = np.log2(errs[1] / errs[2])
        assert order1 > 3.5, f"expected ~4th order, got {order1:.2f}"
        # later ratios may saturate at float32 precision; accept either
        assert order2 > 3.0 or errs[2] < 1e-6

    def test_multi_output_times(self):
        y0 = jnp.array([0.25])
        ts = jnp.linspace(0.0, 3.0, 7)
        args = {"r": jnp.asarray(0.9)}
        ys = rk4_solve(_logistic_rhs, y0, ts, args, substeps=32)
        exact = _logistic_exact(np.asarray(ts), 0.25, 0.9)
        np.testing.assert_allclose(np.asarray(ys[:, 0]), exact, rtol=1e-5, atol=1e-6)

    def test_pytree_state(self):
        y0 = {"a": jnp.ones((3,)), "b": jnp.zeros((2, 2))}
        rhs = lambda t, y, args: {"a": -y["a"], "b": y["b"] * 0.0 + 1.0}
        ts = jnp.array([0.0, 1.0])
        ys = rk4_solve(rhs, y0, ts, None, substeps=64)
        np.testing.assert_allclose(np.asarray(ys["a"][-1]), np.exp(-1.0) * np.ones(3), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ys["b"][-1]), np.ones((2, 2)), rtol=1e-5)


class TestDopri5:
    def test_accuracy_rtol_1e5(self):
        """North-star accuracy bar: match analytic trajectory at rtol 1e-5."""
        y0 = jnp.array([0.1, 0.5, 0.9])
        ts = jnp.linspace(0.0, 4.0, 9)
        args = {"r": jnp.asarray(1.3)}
        ys, stats = dopri5_solve(
            _logistic_rhs, y0, ts, args, rtol=1e-5, atol=1e-7
        )
        assert bool(stats["ok"])
        for i, y0i in enumerate([0.1, 0.5, 0.9]):
            exact = _logistic_exact(np.asarray(ts), y0i, 1.3)
            np.testing.assert_allclose(
                np.asarray(ys[:, i]), exact, rtol=3e-5, atol=3e-6
            )

    def test_stiffish_oscillator(self):
        """Harmonic oscillator: energy drift small, dense output accurate."""
        omega = 5.0

        def rhs(t, y, args):
            p, v = y[..., 0], y[..., 1]
            return jnp.stack([v, -(omega**2) * p], axis=-1)

        y0 = jnp.array([1.0, 0.0])
        ts = jnp.linspace(0.0, 2.0, 21)
        ys, stats = dopri5_solve(rhs, y0, ts, None, rtol=1e-6, atol=1e-8)
        assert bool(stats["ok"])
        exact_p = np.cos(omega * np.asarray(ts))
        np.testing.assert_allclose(np.asarray(ys[:, 0]), exact_p, atol=2e-4)

    def test_adaptive_beats_fixed_budget(self):
        """Adaptivity should place steps where dynamics are fast."""

        def rhs(t, y, args):
            return -50.0 * (y - jnp.cos(t))

        y0 = jnp.array([0.0])
        ts = jnp.array([0.0, 3.0])
        ys, stats = dopri5_solve(rhs, y0, ts, None, rtol=1e-5, atol=1e-7)
        assert bool(stats["ok"])
        # exact solution of the linear ODE
        lam = 50.0
        t = 3.0
        exact = (
            lam**2 / (lam**2 + 1) * np.cos(t)
            + lam / (lam**2 + 1) * np.sin(t)
            - lam**2 / (lam**2 + 1) * np.exp(-lam * t)
        )
        assert abs(float(ys[-1, 0]) - exact) < 1e-4


class TestAdjoint:
    @pytest.mark.slow
    def test_gradient_agreement_with_backprop(self):
        """Adjoint dopri5 grads vs checkpointed-backprop RK4 grads."""

        def rhs(t, y, args):
            W, b = args["W"], args["b"]
            return jnp.tanh(y @ W + b) - 0.1 * y

        key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        D = 4
        y0 = jax.random.normal(k1, (2, D)) * 0.3
        args = {
            "W": jax.random.normal(k2, (D, D)) * 0.4,
            "b": jax.random.normal(k3, (D,)) * 0.1,
        }
        ts = jnp.linspace(0.0, 1.0, 5)

        def loss_adjoint(y0, args):
            ys = odeint_adjoint(rhs, y0, ts, args, rtol=1e-7, atol=1e-9)
            return jnp.sum(ys[-1] ** 2) + 0.5 * jnp.sum(ys[2] ** 2)

        def loss_rk4(y0, args):
            ys = rk4_solve(rhs, y0, ts, args, substeps=64)
            return jnp.sum(ys[-1] ** 2) + 0.5 * jnp.sum(ys[2] ** 2)

        ga = jax.grad(loss_adjoint, argnums=(0, 1))(y0, args)
        gb = jax.grad(loss_rk4, argnums=(0, 1))(y0, args)

        np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gb[0]), rtol=2e-3, atol=2e-5)
        for k in args:
            np.testing.assert_allclose(
                np.asarray(ga[1][k]), np.asarray(gb[1][k]), rtol=2e-3, atol=2e-5
            )

    def test_jit_and_vmap_compose(self):
        def rhs(t, y, args):
            return -args["k"] * y

        ts = jnp.array([0.0, 1.0])

        @jax.jit
        def f(y0, k):
            ys = odeint_adjoint(rhs, y0, ts, {"k": k}, rtol=1e-6, atol=1e-8)
            return ys[-1]

        y0 = jnp.ones((3,))
        out = f(y0, jnp.asarray(2.0))
        np.testing.assert_allclose(np.asarray(out), np.exp(-2.0), rtol=1e-5)

        g = jax.grad(lambda k: jnp.sum(f(y0, k)))(jnp.asarray(2.0))
        # d/dk [3*exp(-k)] = -3 exp(-k)
        np.testing.assert_allclose(float(g), -3 * np.exp(-2.0), rtol=1e-3)


class TestDiscreteAdjoint:
    """ode/discrete_adjoint.py — backprop through the forward's accepted
    step sequence. Values must equal dopri5_solve's exactly (same
    controller, same steps); gradients must agree with the continuous
    adjoint and with checkpointed RK4 backprop."""

    @staticmethod
    def _mlp_setup():
        def rhs(t, y, args):
            W, b = args["W"], args["b"]
            return jnp.tanh(y @ W + b) - 0.1 * y + 0.05 * jnp.sin(t)

        key = jax.random.PRNGKey(7)
        k1, k2, k3 = jax.random.split(key, 3)
        D = 4
        y0 = jax.random.normal(k1, (2, D)) * 0.3
        args = {
            "W": jax.random.normal(k2, (D, D)) * 0.4,
            "b": jax.random.normal(k3, (D,)) * 0.1,
        }
        ts = jnp.linspace(0.0, 1.0, 5)
        return rhs, y0, ts, args

    def test_forward_matches_dopri5(self):
        from ananke_abm_tpu.ode import odeint_discrete_adjoint

        rhs, y0, ts, args = self._mlp_setup()
        want, stats = dopri5_solve(rhs, y0, ts, args, rtol=1e-6, atol=1e-8)
        assert bool(stats["ok"])
        got = odeint_discrete_adjoint(
            rhs, y0, ts, args, rtol=1e-6, atol=1e-8
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    @pytest.mark.parametrize("ckpt_every", [1, 4, 64])
    def test_gradient_agreement(self, ckpt_every):
        """Grads vs the continuous adjoint AND vs checkpointed RK4
        backprop; the loss touches an INTERIOR output row so the
        dense-output interpolation cotangents (r1..r5 fold) are
        exercised, not just the endpoint."""
        from ananke_abm_tpu.ode import odeint_discrete_adjoint

        rhs, y0, ts, args = self._mlp_setup()

        def mk_loss(solver):
            def loss(y0, args):
                ys = solver(y0, args)
                return jnp.sum(ys[-1] ** 2) + 0.5 * jnp.sum(ys[2] ** 2)

            return loss

        loss_disc = mk_loss(
            lambda y0, a: odeint_discrete_adjoint(
                rhs, y0, ts, a, rtol=1e-7, atol=1e-9,
                ckpt_every=ckpt_every,
            )
        )
        loss_cont = mk_loss(
            lambda y0, a: odeint_adjoint(rhs, y0, ts, a, rtol=1e-7, atol=1e-9)
        )
        loss_rk4 = mk_loss(
            lambda y0, a: rk4_solve(rhs, y0, ts, a, substeps=64)
        )

        gd = jax.grad(loss_disc, argnums=(0, 1))(y0, args)
        gc = jax.grad(loss_cont, argnums=(0, 1))(y0, args)
        gr = jax.grad(loss_rk4, argnums=(0, 1))(y0, args)
        for got, want in ((gd, gc), (gd, gr)):
            np.testing.assert_allclose(
                np.asarray(got[0]), np.asarray(want[0]), rtol=2e-3, atol=2e-5
            )
            for k in args:
                np.testing.assert_allclose(
                    np.asarray(got[1][k]), np.asarray(want[1][k]),
                    rtol=2e-3, atol=2e-5,
                )

    @pytest.mark.slow
    @pytest.mark.parametrize("store_f,ckpt_every,ckpt_dtype,tol", [
        (True, 1, None, 1e-6), (True, 4, None, 1e-6),
        ("bf16", 1, None, 5e-3), ("bf16", 1, "bf16", 2e-2),
    ])
    def test_store_f_gradients(self, store_f, ckpt_every, ckpt_dtype,
                               tol):
        """store_f replaces the backward's per-segment rhs re-evaluation
        with the forward's recorded FSAL eval: f32 storage must
        reproduce the recompute path's gradients to f32 rounding; bf16
        storage within the bf16-backward noise class. Values must be
        bit-identical (the forward solve is unchanged)."""
        from ananke_abm_tpu.ode import odeint_discrete_adjoint

        rhs, y0, ts, args = self._mlp_setup()

        def mk_loss(**kw):
            def loss(y0, args):
                ys = odeint_discrete_adjoint(
                    rhs, y0, ts, args, rtol=1e-7, atol=1e-9,
                    ckpt_every=ckpt_every, **kw)
                return jnp.sum(ys[-1] ** 2) + 0.5 * jnp.sum(ys[2] ** 2)

            return loss

        base = mk_loss()
        fast = mk_loss(store_f=store_f, ckpt_dtype=ckpt_dtype)
        np.testing.assert_array_equal(
            np.asarray(fast(y0, args)), np.asarray(base(y0, args)))
        gb = jax.grad(base, argnums=(0, 1))(y0, args)
        gf = jax.grad(fast, argnums=(0, 1))(y0, args)
        np.testing.assert_allclose(
            np.asarray(gf[0]), np.asarray(gb[0]), rtol=tol, atol=tol)
        for k in args:
            np.testing.assert_allclose(
                np.asarray(gf[1][k]), np.asarray(gb[1][k]),
                rtol=tol, atol=tol)

    def test_invalid_store_f_and_ckpt_dtype_raise(self):
        """Typo'd knob values must fail loudly at trace time, not pick a
        silently different memory/precision configuration."""
        from ananke_abm_tpu.ode import odeint_discrete_adjoint

        rhs, y0, ts, args = self._mlp_setup()
        with pytest.raises(ValueError, match="store_f"):
            odeint_discrete_adjoint(rhs, y0, ts, args, store_f="auto")
        with pytest.raises(ValueError, match="ckpt_dtype"):
            odeint_discrete_adjoint(rhs, y0, ts, args, ckpt_dtype="fp16")

    def test_unpaired_step_hooks_raise(self):
        """step_impl without step_vjp (or vice versa) must fail loudly
        at the call site — the generic jax.vjp fallback would otherwise
        die deep in tracing when the step is a Pallas kernel with no AD
        rule. The explicit sentinels opt back in."""
        from ananke_abm_tpu.ode import odeint_discrete_adjoint

        rhs, y0, ts, args = self._mlp_setup()
        fake_step = lambda t0, h, y, f, a: None
        fake_vjp = lambda t0, h, y, f, a, g: None
        with pytest.raises(ValueError, match="together"):
            odeint_discrete_adjoint(rhs, y0, ts, args, step_impl=fake_step)
        with pytest.raises(ValueError, match="together"):
            odeint_discrete_adjoint(rhs, y0, ts, args, step_vjp=fake_vjp)
        with pytest.raises(ValueError, match="sentinel"):
            odeint_discrete_adjoint(
                rhs, y0, ts, args, step_impl=fake_step, step_vjp="generic?"
            )
        # sentinel pair == plain tableau path: runs and matches dopri5
        ys = odeint_discrete_adjoint(
            rhs, y0, ts, args, step_impl="tableau", step_vjp="generic"
        )
        ref, _ = dopri5_solve(rhs, y0, ts, args)
        np.testing.assert_allclose(
            np.asarray(ys), np.asarray(ref), rtol=1e-6, atol=1e-6
        )

    def test_jit_compose_and_scalar_args(self):
        from ananke_abm_tpu.ode import odeint_discrete_adjoint

        rhs = lambda t, y, args: -args["k"] * y
        ts = jnp.array([0.0, 1.0])

        @jax.jit
        def f(y0, k):
            ys = odeint_discrete_adjoint(
                rhs, y0, ts, {"k": k}, rtol=1e-6, atol=1e-8
            )
            return ys[-1]

        y0 = jnp.ones((3,))
        np.testing.assert_allclose(
            np.asarray(f(y0, jnp.asarray(2.0))), np.exp(-2.0), rtol=1e-5
        )
        g = jax.grad(lambda k: jnp.sum(f(y0, k)))(jnp.asarray(2.0))
        np.testing.assert_allclose(float(g), -3 * np.exp(-2.0), rtol=1e-3)

    def test_max_accepted_exceeded_poisons(self):
        """A solve that needs more accepted steps than max_accepted must
        NaN-poison the unfilled rows — in the value-only call AND under
        grad — never silently truncate the gradient."""
        from ananke_abm_tpu.ode import odeint_discrete_adjoint

        rhs = lambda t, y, args: -50.0 * (y - jnp.cos(t))
        ts = jnp.linspace(0.0, 3.0, 6)
        y0 = jnp.zeros(2)
        ys = odeint_discrete_adjoint(
            rhs, y0, ts, rtol=1e-8, atol=1e-10, max_accepted=4
        )
        assert np.isnan(np.asarray(ys)[-1]).all()
        g = jax.grad(
            lambda y0: jnp.sum(
                odeint_discrete_adjoint(
                    rhs, y0, ts, rtol=1e-8, atol=1e-10, max_accepted=4
                )
                ** 2
            )
        )(y0)
        assert np.isnan(np.asarray(g)).all()

    def test_sized_max_accepted_is_exact(self):
        """The same stiff solve with max_accepted sized generously is ok
        and matches dopri5_solve."""
        from ananke_abm_tpu.ode import odeint_discrete_adjoint

        rhs = lambda t, y, args: -50.0 * (y - jnp.cos(t))
        ts = jnp.linspace(0.0, 3.0, 6)
        y0 = jnp.zeros(2)
        want, stats = dopri5_solve(rhs, y0, ts, None, rtol=1e-6, atol=1e-8)
        assert bool(stats["ok"])
        got = odeint_discrete_adjoint(
            rhs, y0, ts, rtol=1e-6, atol=1e-8, max_accepted=512,
            ckpt_every=8,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestSDE:
    def test_deterministic_limit(self):
        """Zero diffusion must reduce to Euler ODE."""
        drift = lambda t, y, args: -y
        diff = lambda t, y, args: jnp.zeros_like(y)
        y0 = jnp.ones((4,))
        ts = jnp.linspace(0.0, 1.0, 5)
        ys = euler_maruyama_solve(
            drift, diff, y0, ts, jax.random.PRNGKey(0), substeps=100
        )
        np.testing.assert_allclose(
            np.asarray(ys[-1]), np.exp(-1.0) * np.ones(4), rtol=2e-3
        )

    def test_ou_stationary_variance(self):
        """OU process dy = -theta y dt + sigma dW: Var -> sigma^2/(2 theta)."""
        theta, sigma = 2.0, 0.5
        drift = lambda t, y, args: -theta * y
        diff = lambda t, y, args: jnp.full_like(y, sigma)
        n = 4096
        y0 = jnp.zeros((n,))
        ts = jnp.linspace(0.0, 4.0, 9)
        ys = euler_maruyama_solve(
            drift, diff, y0, ts, jax.random.PRNGKey(42), substeps=50
        )
        var = float(jnp.var(ys[-1]))
        expected = sigma**2 / (2 * theta)
        assert abs(var - expected) / expected < 0.15

    def test_reproducible(self):
        drift = lambda t, y, args: -y
        diff = lambda t, y, args: jnp.ones_like(y) * 0.3
        y0 = jnp.ones((8,))
        ts = jnp.linspace(0.0, 1.0, 3)
        a = euler_maruyama_solve(drift, diff, y0, ts, jax.random.PRNGKey(7), substeps=10)
        b = euler_maruyama_solve(drift, diff, y0, ts, jax.random.PRNGKey(7), substeps=10)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_gradient_flows(self):
        def loss(scale):
            drift = lambda t, y, args: -y * args
            diff = lambda t, y, args: jnp.ones_like(y) * 0.1
            ys = euler_maruyama_solve(
                drift, diff, jnp.ones((4,)), jnp.array([0.0, 1.0]),
                jax.random.PRNGKey(0), args=scale, substeps=20,
            )
            return jnp.sum(ys[-1] ** 2)

        g = jax.grad(loss)(jnp.asarray(1.0))
        assert np.isfinite(float(g)) and float(g) != 0.0

    def test_fixed_grid_is_output_grid_independent(self):
        """dt mode: the realized path must not depend on WHICH output
        times are requested — coarse and dense grids over the same span
        return identical states at shared times (the round-3 latent_ode
        train/inference-consistency fix)."""
        drift = lambda t, y, args: -0.8 * y + jnp.sin(t)
        diff = lambda t, y, args: jnp.full_like(y, 0.3)
        y0 = jnp.ones((6,))
        key = jax.random.PRNGKey(5)
        coarse = jnp.array([0.0, 0.7, 1.9, 4.0])
        dense = jnp.linspace(0.0, 4.0, 81)  # includes 0.7? no — snap test
        kw = dict(dt=0.01, num_steps=400)
        ys_c = euler_maruyama_solve(drift, diff, y0, coarse, key, **kw)
        ys_d = euler_maruyama_solve(drift, diff, y0, dense, key, **kw)
        # shared times: both grids snap to the same internal index
        for tc, row_c in zip(np.asarray(coarse), np.asarray(ys_c)):
            j = int(np.argmin(np.abs(np.asarray(dense) - tc)))
            if abs(float(dense[j]) - tc) < 0.005:  # same snapped point
                np.testing.assert_array_equal(row_c, np.asarray(ys_d)[j])

    def test_fixed_grid_deterministic_limit_and_dups(self):
        """Zero diffusion reduces to fixed-step Euler; duplicate snapped
        output times repeat the same state; oversized num_steps is a
        no-op past ts[-1]."""
        drift = lambda t, y, args: -y
        diff = lambda t, y, args: jnp.zeros_like(y)
        y0 = jnp.ones((3,))
        ts = jnp.array([0.0, 0.5, 0.501, 1.0])  # 0.5/0.501 snap together
        ys = euler_maruyama_solve(
            drift, diff, y0, ts, jax.random.PRNGKey(0),
            dt=0.01, num_steps=150,  # oversized past the 1.0 span
        )
        ys = np.asarray(ys)
        np.testing.assert_array_equal(ys[1], ys[2])
        # exact fixed-step Euler value: (1 - dt)^(1/dt)
        np.testing.assert_allclose(ys[3], (1 - 0.01) ** 100 * np.ones(3),
                                   rtol=1e-5)

    def test_fixed_grid_undersized_num_steps_rejected(self):
        """Regression: num_steps * dt < span used to silently clamp every
        later output to the end-of-grid state. Concrete ts now raise;
        traced ts NaN-poison the out-of-span rows (dopri5 convention)."""
        drift = lambda t, y, args: -y
        diff = lambda t, y, args: jnp.zeros_like(y)
        y0 = jnp.ones((3,))
        ts = jnp.array([0.0, 0.5, 2.0])  # span 2.0 > 100 * 0.01
        with pytest.raises(ValueError, match="does not cover"):
            euler_maruyama_solve(
                drift, diff, y0, ts, jax.random.PRNGKey(0),
                dt=0.01, num_steps=100,
            )
        # traced ts: in-span rows intact, out-of-span rows NaN
        ys = jax.jit(
            lambda ts: euler_maruyama_solve(
                drift, diff, y0, ts, jax.random.PRNGKey(0),
                dt=0.01, num_steps=100,
            )
        )(ts)
        ys = np.asarray(ys)
        assert np.isfinite(ys[:2]).all()
        assert np.isnan(ys[2]).all()

    def test_fixed_grid_closure_captured_ts_under_jit(self):
        """Regression: a grid closure-captured into a jitted train step is
        a CONCRETE array whose jnp ops are still staged (op-level constant
        lifting in jax 0.9), so the span check must not probe concreteness
        via isinstance(ts, Tracer) + float(ts[-1] - ts[0]) — that raised
        ConcretizationTypeError and broke every SDE training path."""
        drift = lambda t, y, args: -y
        diff = lambda t, y, args: jnp.zeros_like(y)
        ts = jnp.array([0.0, 0.5, 1.0])  # concrete, closed over below

        @jax.jit
        def run(y0):
            return euler_maruyama_solve(
                drift, diff, y0, ts, jax.random.PRNGKey(0),
                dt=0.01, num_steps=100,
            )

        ys = np.asarray(run(jnp.ones((3,))))
        assert np.isfinite(ys).all()

        # ...and the eager contract error still fires at trace time for a
        # closure-captured OUT-OF-SPAN grid (np.asarray sees the constant)
        ts_bad = jnp.array([0.0, 0.5, 2.0])

        @jax.jit
        def run_bad(y0):
            return euler_maruyama_solve(
                drift, diff, y0, ts_bad, jax.random.PRNGKey(0),
                dt=0.01, num_steps=100,
            )

        with pytest.raises(ValueError, match="does not cover"):
            run_bad(jnp.ones((3,)))

    def test_fixed_grid_gradient_flows(self):
        def loss(scale):
            drift = lambda t, y, args: -y * args
            diff = lambda t, y, args: jnp.ones_like(y) * 0.1
            ys = euler_maruyama_solve(
                drift, diff, jnp.ones((4,)), jnp.array([0.0, 1.0]),
                jax.random.PRNGKey(0), args=scale, dt=0.02, num_steps=50,
            )
            return jnp.sum(ys[-1] ** 2)

        g = jax.grad(loss)(jnp.asarray(1.0))
        assert np.isfinite(float(g)) and float(g) != 0.0


class TestFailureSurfacing:
    """max_steps exhaustion must be loud: unfilled rows NaN, ok=False
    (VERDICT r1 item 8), never stale buffer contents."""

    def test_exhaustion_poisons_unfilled_rows(self):
        from ananke_abm_tpu.ode.dopri5 import dopri5_solve

        # extremely stiff: lambda = -1e8 forces tiny steps; 4 attempted
        # steps cannot reach t=1
        rhs = lambda t, y, args: -1e8 * y
        ts = jnp.linspace(0.0, 1.0, 6)
        ys, stats = dopri5_solve(rhs, jnp.ones(3), ts, max_steps=4)
        assert not bool(stats["ok"])
        ys = np.asarray(ys)
        assert np.isfinite(ys[0]).all()  # y0 row always written
        assert np.isnan(ys[-1]).all()  # unfilled tail poisoned

    def test_ok_run_has_no_nans(self):
        from ananke_abm_tpu.ode.dopri5 import dopri5_solve

        rhs = lambda t, y, args: -y
        ts = jnp.linspace(0.0, 1.0, 6)
        ys, stats = dopri5_solve(rhs, jnp.ones(3), ts)
        assert bool(stats["ok"])
        assert np.isfinite(np.asarray(ys)).all()

    def test_odeint_return_stats_paths(self):
        from ananke_abm_tpu.ode import odeint

        rhs = lambda t, y, args: -y
        ts = jnp.linspace(0.0, 1.0, 4)
        y0 = jnp.ones(2)
        ys, stats = odeint(rhs, y0, ts, method="rk4", return_stats=True)
        assert bool(stats["ok"]) and int(stats["n_steps"]) == 3
        ys, stats = odeint(
            rhs, y0, ts, method="dopri5", adjoint=False, return_stats=True
        )
        assert bool(stats["ok"])
        ys, stats = odeint(
            rhs, y0, ts, method="dopri5", adjoint=True, return_stats=True
        )
        assert bool(stats["ok"])

    def test_adjoint_exhaustion_reports_not_ok(self):
        from ananke_abm_tpu.ode import odeint

        rhs = lambda t, y, args: -1e8 * y
        ts = jnp.linspace(0.0, 1.0, 4)
        ys, stats = odeint(
            rhs, jnp.ones(2), ts, method="dopri5", adjoint=True,
            max_steps=4, return_stats=True,
        )
        assert not bool(stats["ok"])
        assert np.isnan(np.asarray(ys)[-1]).all()
