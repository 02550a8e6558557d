"""Double-f32 (df64) arithmetic: error-free transformations and compensated
reductions must reach ~2^-48 relative accuracy — far beyond plain f32's
sqrt(n)*2^-24 — using only f32 mul/add (no fma, TPU-VPU compatible)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlff_tpu.ops import df64


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_split_join_roundtrip(rng):
    # hi+lo carries 48 of f64's 53 mantissa bits: ~2^-48 relative round-trip
    x = jnp.asarray(rng.standard_normal(1000) * 10.0**rng.integers(-8, 8, 1000))
    h, l = df64.split_f64(x)
    rt = np.asarray(df64.join_f64(h, l))
    rel = np.abs(rt - np.asarray(x)) / np.abs(np.asarray(x))
    assert rel.max() < 2.0**-47, rel.max()


def test_two_sum_exact(rng):
    a = jnp.asarray(rng.standard_normal(1000), jnp.float32)
    b = jnp.asarray(rng.standard_normal(1000) * 1e-6, jnp.float32)
    s, e = jax.jit(df64.two_sum)(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    np.testing.assert_array_equal(
        np.asarray(s, np.float64) + np.asarray(e, np.float64), exact)


def test_two_prod_exact(rng):
    a = jnp.asarray(rng.standard_normal(1000), jnp.float32)
    b = jnp.asarray(rng.standard_normal(1000), jnp.float32)
    p, e = jax.jit(df64.two_prod)(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    np.testing.assert_array_equal(
        np.asarray(p, np.float64) + np.asarray(e, np.float64), exact)


def test_compensated_dot_accuracy(rng):
    n, m = 20000, 64
    B = rng.standard_normal((n, m)) / np.sqrt(n)
    v = rng.standard_normal(n)
    Bh, Bl = df64.split_f64(jnp.asarray(B))
    vh, vl = df64.split_f64(jnp.asarray(v))

    uh, ul = jax.jit(df64.df64_dot_bv)(Bh, Bl, vh, vl)
    u = np.asarray(df64.join_f64(uh, ul))
    u_ref = B.T @ v
    rel = np.abs(u - u_ref).max() / np.abs(u_ref).max()
    # plain f32 is ~5e-7 at this n (measured); df64 must be ~5 decades better
    assert rel < 3e-12, rel

    x = rng.standard_normal(m)
    xh, xl = df64.split_f64(jnp.asarray(x))
    yh, yl = jax.jit(df64.df64_dot_bx)(Bh, Bl, xh, xl)
    y = np.asarray(df64.join_f64(yh, yl))
    y_ref = B @ x
    rel = np.abs(y - y_ref).max() / np.abs(y_ref).max()
    assert rel < 3e-12, rel


def test_compensated_dot_beats_f32_by_decades(rng):
    n = 50000
    B = rng.standard_normal((n, 8)) / np.sqrt(n)
    v = rng.standard_normal(n)
    u_ref = B.T @ v
    u_f32 = (B.astype(np.float32).T @ v.astype(np.float32)).astype(np.float64)
    rel_f32 = np.abs(u_f32 - u_ref).max() / np.abs(u_ref).max()

    Bh, Bl = df64.split_f64(jnp.asarray(B))
    vh, vl = df64.split_f64(jnp.asarray(v))
    u = np.asarray(df64.join_f64(*jax.jit(df64.df64_dot_bv)(Bh, Bl, vh, vl)))
    rel_df = np.abs(u - u_ref).max() / np.abs(u_ref).max()
    assert rel_df < 1e-4 * rel_f32, (rel_df, rel_f32)


def test_df64_woodbury_apply_matches_split(rng):
    """The Pallas df64 apply path equals the XLA split apply to f64-class
    accuracy (interpret mode off-TPU)."""
    from mlff_tpu.solvers import preconditioners as pc

    n, m = 700, 150
    lam = 1e-10
    L = rng.standard_normal((n, m)) / np.sqrt(n)
    P = pc.woodbury_from_factor(jnp.asarray(L), lam)
    Pdf = pc.df64_from_split(P)
    v = jnp.asarray(rng.standard_normal(n))
    z_ref = np.asarray(pc.woodbury_split_apply(P, v))
    z_df = np.asarray(pc.df64_woodbury_apply(Pdf, v))
    rel = np.abs(z_df - z_ref).max() / np.abs(z_ref).max()
    assert rel < 1e-11, rel


def test_df64_three_component_storage(rng):
    """components=3 stores the 2^-48-scale residual of B exactly enough to
    kill the frozen-operator quantization: Bh+Bl+Bm reconstructs B to
    ~2^-70, and the apply matches the split apply at least as well as the
    two-component form."""
    from mlff_tpu.ops import pallas_df64 as pdf
    from mlff_tpu.solvers import preconditioners as pc

    n, m = 700, 150
    lam = 1e-10
    L = rng.standard_normal((n, m)) / np.sqrt(n)
    P = pc.woodbury_from_factor(jnp.asarray(L), lam)
    B64 = np.asarray(P.B)
    Pdf = pc.df64_from_split(P, components=3)
    assert Pdf.Bm is not None
    recon = (np.asarray(Pdf.Bh, np.float64)
             + np.asarray(Pdf.Bl, np.float64)
             + np.asarray(Pdf.Bm, np.float64))[:B64.shape[0], :B64.shape[1]]
    rel = np.abs(recon - B64).max() / np.abs(B64).max()
    assert rel < 2.0**-68, rel

    v = jnp.asarray(rng.standard_normal(n))
    P2 = pc.woodbury_from_factor(jnp.asarray(L), lam)
    z_ref = np.asarray(pc.woodbury_split_apply(P2, v))
    z_df = np.asarray(pc.df64_woodbury_apply(Pdf, v))
    rel = np.abs(z_df - z_ref).max() / np.abs(z_ref).max()
    assert rel < 1e-11, rel


def test_df64_from_colblocks_matches_xla_apply():
    """The colblock -> monolithic df64 (2-component) conversion applies the
    same operator as the XLA colblock apply (to 2^-48 frozen-quantization
    grade).  This is the n = 500k route: the XLA f64 apply at that scale
    compile-OOMs on hoisted X64Split copies of the factor blocks."""
    import numpy as np

    from mlff_tpu.solvers import preconditioners as pc

    rng = np.random.default_rng(3)
    n, widths = 700, (130, 130, 60)
    lam = 1e-10
    Bs = tuple(jnp.asarray(rng.normal(size=(n, w)) / n) for w in widths)
    m = sum(widths)
    W2 = jnp.asarray(np.triu(rng.normal(size=(m, m))) / m)
    Bs_p, W2_p = pc._pad_colblocks(Bs, W2)
    P_xla = pc.WoodburyColBlockPreconditioner(
        Bs=Bs_p, W2=W2_p, lam=jnp.asarray(lam))
    P_df = pc.df64_from_colblocks(
        tuple(jnp.array(B) for B in Bs_p), jnp.array(W2_p), lam)
    v = jnp.asarray(rng.normal(size=n))
    ref = np.asarray(P_xla(v))
    out = np.asarray(P_df(v))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 5e-11, rel
