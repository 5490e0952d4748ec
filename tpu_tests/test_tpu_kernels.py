"""Real-chip TPU smoke lane for the Pallas kernels.

The CI suite (`tests/`) forces CPU and runs the kernels in interpret mode
only — Mosaic lowering/precision regressions were previously caught by
ad-hoc manual runs. This lane compiles the ACTUAL kernels on the attached
TPU and cross-checks them against the XLA product engine.

Run (one command, detached — remote compiles can take minutes and killing a
python mid-compile wedges the tunnel):

    nohup python -m pytest tpu_tests/ -q > /tmp/tpu_smoke.log 2>&1 &

Healthy: all tests pass in ~2-6 min (first run compiles; repeats hit the
persistent cache).
"""
import jax
import pytest

if jax.default_backend() not in ("tpu", "axon"):
    pytest.skip("TPU lane: needs a real TPU backend (got "
                f"{jax.default_backend()!r})", allow_module_level=True)

jax.config.update("jax_compilation_cache_dir",
                  "/tmp/diffquantum_tpu_jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from diffquantum_tpu.dynamics.hamiltonian import (  # noqa: E402
    ControlledHamiltonian, TermStructure)
from diffquantum_tpu.dynamics.product import (  # noqa: E402
    evolve_product, evolve_product_fused)
from diffquantum_tpu.models import maxcut  # noqa: E402
from diffquantum_tpu.ops import cpx, linalg  # noqa: E402
from diffquantum_tpu.pulses.envelope import SimpleEnvelope  # noqa: E402


def _coeff(env, seed=0, scale=0.5):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(env.coeff_shape),
                       dtype=jnp.float32) * scale


def _energy_fns(prob, n_steps):
    def e(evolver):
        def f(c):
            psi = evolver(prob.ham, prob.envelope, c, prob.psi0, 0.0,
                          prob.T, horizon=prob.T, n_steps=n_steps)
            return jnp.sum(cpx.abs2(psi) * prob.measurement.diag, axis=-1)
        return f
    return e(evolve_product_fused), e(evolve_product)


def test_fused_12q_forward_backward_vs_xla():
    prob = maxcut.build_maxcut(12, maxcut.ring_graph(12), n_basis=6,
                               dense=False)
    f_fused, f_xla = _energy_fns(prob, 30)
    c = _coeff(prob.envelope)
    vf, gf = jax.jit(jax.value_and_grad(f_fused))(c)
    vx, gx = jax.jit(jax.value_and_grad(f_xla))(c)
    np.testing.assert_allclose(float(vf), float(vx), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               rtol=1e-3, atol=1e-4)


def test_fused_same_qubit_xy_palindromic_on_tpu():
    """The symmetrized (palindromic) rotation list for same-qubit X+Y —
    round-1 validated the fused X/Y kernels on TPU by hand; this pins the
    round-2 ordering change on the real chip."""
    n, d = 11, 2**11
    structure, omegas = [], []
    for i in range(n):
        structure.append(TermStructure(
            kind="diag", diag=linalg.zz_diagonal(n, i, (i + 1) % n)))
        omegas.append(np.pi)
    for g in (linalg.X, linalg.Y):  # both on qubit 4
        structure.append(TermStructure(kind="1q", qubit=4, local=g))
        omegas.append(np.pi)
    ham = ControlledHamiltonian.create_structured(
        d, structure,
        h0_structure=TermStructure(kind="diag", diag=np.zeros(d)),
        dtype=jnp.float32)
    env = SimpleEnvelope(basis="legendre", n_basis=4, omegas=tuple(omegas))
    c = _coeff(env, seed=3)
    psi0 = cpx.from_complex(np.full(d, d ** -0.5, np.complex128),
                            dtype=jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).standard_normal(d), jnp.float32)

    def e(evolver):
        def f(cc):
            psi = evolver(ham, env, cc, psi0, 0.0, 1.5, horizon=1.5,
                          n_steps=16)
            return jnp.sum(cpx.abs2(psi) * w, axis=-1)
        return f

    vf, gf = jax.jit(jax.value_and_grad(e(evolve_product_fused)))(c)
    vx, gx = jax.jit(jax.value_and_grad(e(evolve_product)))(c)
    np.testing.assert_allclose(float(vf), float(vx), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               rtol=1e-3, atol=1e-4)


def test_fused_batched_seeds_vs_vmapped_xla():
    prob = maxcut.build_maxcut(10, maxcut.ring_graph(10), n_basis=4,
                               dense=False)
    n_seeds, n_steps = 8, 12
    rng = np.random.default_rng(5)
    cs = jnp.asarray(rng.standard_normal(
        (n_seeds,) + prob.envelope.coeff_shape), jnp.float32) * 0.5
    psi_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n_seeds,) + x.shape), prob.psi0)

    def e_fused(c):
        psi = evolve_product_fused(prob.ham, prob.envelope, c, psi_b, 0.0,
                                   prob.T, horizon=prob.T, n_steps=n_steps)
        return jnp.sum(cpx.abs2(psi) * prob.measurement.diag, axis=-1).sum()

    def e_xla(c):
        def one(ci, pi):
            psi = evolve_product(prob.ham, prob.envelope, ci, pi, 0.0,
                                 prob.T, horizon=prob.T, n_steps=n_steps)
            return jnp.sum(cpx.abs2(psi) * prob.measurement.diag, axis=-1)
        return jax.vmap(one)(c, psi_b).sum()

    vf, gf = jax.jit(jax.value_and_grad(e_fused))(cs)
    vx, gx = jax.jit(jax.value_and_grad(e_xla))(cs)
    np.testing.assert_allclose(float(vf), float(vx), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               rtol=1e-3, atol=1e-4)


def test_fused_norm_preservation_long_chain():
    """1000-step 16-qubit fused chain: unitary to f32 accumulation level."""
    prob = maxcut.build_maxcut(16, maxcut.ring_graph(16), n_basis=6,
                               dense=False)
    c = _coeff(prob.envelope, seed=9)
    psi = jax.jit(lambda cc: evolve_product_fused(
        prob.ham, prob.envelope, cc, prob.psi0, 0.0, prob.T,
        horizon=prob.T, n_steps=1000))(c)
    norm = float(cpx.norm2(psi))
    assert abs(norm - 1.0) < 5e-4, norm


def test_fast_precision_close_to_full_and_unitary():
    """precision='fast' (single-pass bf16 MXU in-kernel matmuls): values
    stay close to the full-precision kernel over a 30-step chain and grads
    track; the 1000-step 16q chain stays unitary. Perf: ~25% faster 16q
    chains, ~40% faster 64-seed epochs (docs/PERFORMANCE.md)."""
    prob = maxcut.build_maxcut(12, maxcut.ring_graph(12), n_basis=6,
                               dense=False)
    c = _coeff(prob.envelope, seed=3)
    n_steps = 30

    def final(cc, prec):
        return evolve_product_fused(prob.ham, prob.envelope, cc, prob.psi0,
                                    0.0, prob.T, horizon=prob.T,
                                    n_steps=n_steps, precision=prec)

    a = jax.jit(lambda cc: final(cc, "full"))(c)
    b = jax.jit(lambda cc: final(cc, "fast"))(c)
    err = float(jnp.max(jnp.abs(a.re - b.re)) + jnp.max(jnp.abs(a.im - b.im)))
    assert err < 1e-3, err  # bf16-truncation scale over 30 steps

    def loss(cc, prec):
        psi = final(cc, prec)
        return jnp.sum(cpx.abs2(psi) * prob.measurement.diag, axis=-1)

    gfull = jax.jit(jax.grad(lambda cc: loss(cc, "full")))(c)
    gfast = jax.jit(jax.grad(lambda cc: loss(cc, "fast")))(c)
    rel = float(jnp.linalg.norm(gfast - gfull)
                / (jnp.linalg.norm(gfull) + 1e-30))
    assert rel < 3e-2, rel

    prob16 = maxcut.build_maxcut(16, maxcut.ring_graph(16), n_basis=6,
                                 dense=False)
    c16 = _coeff(prob16.envelope, seed=4)
    psi = jax.jit(lambda cc: evolve_product_fused(
        prob16.ham, prob16.envelope, cc, prob16.psi0, 0.0, prob16.T,
        horizon=prob16.T, n_steps=1000, precision="fast"))(c16)
    assert abs(float(cpx.norm2(psi)) - 1.0) < 5e-3


def test_packed_18q_and_19q_on_chip():
    """Round-3 scale frontier: the packed-phase kernels (in-kernel diagonal
    phases from one int32 sign bit-plane + HBM-resident boundary buffers
    via manual DMA) carry 18/19-qubit whole-evolution chains that the
    streamed kernels could not fit in VMEM. Compiles the REAL Mosaic
    lowering of the int32 shift/and sign unpacking and the
    pltpu.make_async_copy boundary path, and cross-checks values+grads
    against the XLA product engine on chip. 18 qubits = the VMEM-resident
    ceiling (the 19q window crashes the compile helper; 19+ routes to the
    chunked engine — see test_chunked_21q_on_chip)."""
    for n in (18,):
        prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=4,
                                   dense=False)
        f_fused, f_xla = _energy_fns(prob, 8)
        c = _coeff(prob.envelope, seed=n)
        vf, gf = jax.jit(jax.value_and_grad(f_fused))(c)
        vx, gx = jax.jit(jax.value_and_grad(f_xla))(c)
        np.testing.assert_allclose(float(vf), float(vx), rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   rtol=1e-3, atol=1e-4)


def test_packed_18q_chained_grad_scan_on_chip():
    """BENCH_r03 regression: the 18q packed BACKWARD compiles differently
    inside a chained `lax.scan` of gradient steps (the production
    train-loop shape) than as a single dispatch — the scan's transpose
    asked 42.62 MiB against a 40 MiB scoped-vmem window and OOM'd at
    compile time while the single-dispatch test above passed. This pins
    the chained shape on chip (`_vmem_params` now grants 44 MiB)."""
    prob = maxcut.build_maxcut(18, maxcut.ring_graph(18), n_basis=4,
                               dense=False)
    f_fused, _ = _energy_fns(prob, 8)
    c = _coeff(prob.envelope, seed=118)
    grad_step = jax.value_and_grad(f_fused)

    @jax.jit
    def chained(c0):
        def body(cc, _):
            _, g = grad_step(cc)
            return cc - 1e-6 * g, None
        out, _ = jax.lax.scan(body, c0, None, length=5)
        return out

    out = jax.block_until_ready(chained(c))
    assert np.all(np.isfinite(np.asarray(out)))
    # direction sanity: the chained update descends
    v0 = float(f_fused(c))
    v1 = float(f_fused(c - 1e-3 * grad_step(c)[1]))
    assert v1 < v0 + 1e-5


def test_chunked_21q_on_chip():
    """The chunked HBM-state engine (two Pallas passes per Strang step,
    state streamed through VMEM slabs) at 21 qubits — past the VMEM
    ceiling entirely. Values + grads vs the XLA product backend on chip."""
    prob = maxcut.build_maxcut(21, maxcut.ring_graph(21), n_basis=4,
                               dense=False)
    f_fused, f_xla = _energy_fns(prob, 6)
    c = _coeff(prob.envelope, seed=21)
    vf, gf = jax.jit(jax.value_and_grad(f_fused))(c)
    vx, gx = jax.jit(jax.value_and_grad(f_xla))(c)
    np.testing.assert_allclose(float(vf), float(vx), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               rtol=1e-3, atol=1e-4)


def test_streamed_fallback_non_packable_on_chip():
    """A 3-valued diagonal row cannot pack into the sign bit-plane — the
    wrapper must keep using the streamed-table kernels (the pre-round-3
    path) on chip."""
    n, d = 10, 2**10
    r0 = np.zeros(d)
    r0[: d // 4] = 2.0
    r0[d // 4: d // 2] = 1.0
    structure = [TermStructure(kind="diag", diag=r0)]
    omegas = [np.pi]
    for q in range(n):
        structure.append(TermStructure(kind="1q", qubit=q, local=linalg.X))
        omegas.append(np.pi)
    ham = ControlledHamiltonian.create_structured(
        d, tuple(structure),
        h0_structure=TermStructure(kind="diag", diag=np.zeros(d)),
        dtype=jnp.float32)
    env = SimpleEnvelope(basis="bspline", n_basis=4, omegas=tuple(omegas))
    c = _coeff(env, seed=2)
    psi0 = cpx.from_complex(linalg.uniform_superposition(n), jnp.float32)
    w = jnp.asarray(np.random.default_rng(4).standard_normal(d), jnp.float32)

    def e(evolver):
        def f(cc):
            psi = evolver(ham, env, cc, psi0, 0.0, 2.0, horizon=2.0,
                          n_steps=12)
            return jnp.sum(cpx.abs2(psi) * w, axis=-1)
        return f

    vf, gf = jax.jit(jax.value_and_grad(e(evolve_product_fused)))(c)
    vx, gx = jax.jit(jax.value_and_grad(e(evolve_product)))(c)
    np.testing.assert_allclose(float(vf), float(vx), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               rtol=1e-3, atol=1e-4)


def test_strings_measurement_and_tfim_on_chip():
    """Matrix-free Pauli-string expectation (XOR gathers + parity signs)
    on the real chip, cross-checked against the diagonal+1q decomposition
    of the same observable applied by hand; then a short fused TFIM
    training descent."""
    from diffquantum_tpu.models import tfim
    from diffquantum_tpu.train import TrainConfig, train_energy

    prob = tfim.build_tfim(10, J=1.0, h=1.0, n_basis=4, dense=False)
    rng = np.random.default_rng(0)
    coeff = jnp.asarray(rng.standard_normal(
        prob.envelope.coeff_shape).astype(np.float32) * 0.3)
    psi = jax.jit(lambda c: evolve_product_fused(
        prob.ham, prob.envelope, c, prob.psi0, 0.0, prob.T,
        horizon=prob.T, n_steps=20))(coeff)
    e_strings = float(prob.measurement.strings.expectation(psi))
    # oracle: ZZ part from the diagonal + X part via 1q applications
    from diffquantum_tpu.dynamics.product import apply_1q_operator
    d = 2**10
    zz = np.zeros(d)
    for i in range(9):
        zz += -1.0 * np.asarray(
            __import__("diffquantum_tpu.ops.linalg",
                       fromlist=["zz_diagonal"]).zz_diagonal(10, i, i + 1))
    e_diag = float(jnp.sum(cpx.abs2(psi) * jnp.asarray(zz, jnp.float32)))
    xr = jnp.asarray(np.array([[0., 1.], [1., 0.]]), jnp.float32)
    xi = jnp.zeros((2, 2), jnp.float32)
    e_x = 0.0
    for q in range(10):
        xp = apply_1q_operator(psi, q, 10, xr, xi)
        e_x += -1.0 * float(jnp.sum(psi.re * xp.re + psi.im * xp.im))
    np.testing.assert_allclose(e_strings, e_diag + e_x, rtol=2e-4,
                               atol=2e-4)

    cfg = TrainConfig(n_basis=4, n_epoch=60, lr=5e-2, grad_mode="adjoint",
                      seed=0)
    res = train_energy(prob.ham, prob.envelope, prob.measurement,
                       prob.psi0, prob.T, cfg,
                       lam_min=prob.exact_ground)
    assert res.losses_energy[-1] < res.losses_energy[0] * 0.5


def test_mcwf_score_gradient_on_chip():
    """The score-function MCWF estimator end-to-end on the real backend
    at 16 QUBITS through backend='fused' (round 4: all trajectories
    lockstep through one batched Pallas rotation block per step — the
    open-system frontier past the 12q XLA-path validation of round 3):
    structured quantum-jump trajectories with return_logp, one descent
    step on the hybrid pathwise+score surrogate."""
    from diffquantum_tpu.dynamics.lindblad import (StructuredNoise,
                                                   evolve_mcwf_structured,
                                                   score_surrogate)

    n = 16
    prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=4,
                               dense=False)
    noise = StructuredNoise(n, t1=[(q, 0.1) for q in range(n)],
                            dephasing=[(3, 0.2)])
    w = prob.measurement.diag
    key = jax.random.PRNGKey(5)

    def loss(cc):
        psis, logps = evolve_mcwf_structured(
            prob.ham, prob.envelope, cc, prob.psi0, noise, 0.0,
            float(prob.T), horizon=float(prob.T), n_steps=10, key=key,
            n_traj=8, return_logp=True, backend="fused")
        vals = jnp.sum(cpx.abs2(psis) * w, axis=-1)
        return score_surrogate(vals, logps)

    vg = jax.jit(jax.value_and_grad(loss))
    c = _coeff(prob.envelope, scale=0.3)
    v0, g0 = vg(c)
    assert np.isfinite(float(v0))
    g0 = np.asarray(g0)
    assert np.all(np.isfinite(g0)) and np.linalg.norm(g0) > 0
    # fixed key => deterministic surrogate; a small step along -g descends
    v1, _ = vg(c - 2e-2 * jnp.asarray(g0))
    assert float(v1) < float(v0) + 1e-6, (float(v0), float(v1))


def test_hop_molecule_drive_set_on_chip():
    """Hop (XX+YY) drives on the REAL Mosaic lowering: the ordered op
    plan with in-kernel iota masks (`ops/fused_product.py::_plan_ops`,
    `_hop_mask`) — the molecule drive set {X, Y, hop, ZZ} on the fused
    engines. Values + grads vs the XLA product engine on chip, hops
    spanning row/row, row/lane and lane/lane bit pairs (12q: qubits 0-4
    rows, 5-11 lanes)."""
    from tests.test_fused_hop import make_hop_problem

    n = 12
    ham, env, coeff, psi0, w = make_hop_problem(
        n, [(0, 1), (3, 8), (9, 11)] + [(i, i + 1) for i in range(4, 8)],
        with_xy=True, seed=12)
    T, n_steps = 2.0, 8

    def e(evolver):
        def f(c):
            psi = evolver(ham, env, c, psi0, 0.0, T, horizon=T,
                          n_steps=n_steps)
            return jnp.sum(cpx.abs2(psi) * w, axis=-1)
        return f

    vf, gf = jax.jit(jax.value_and_grad(e(evolve_product_fused)))(coeff)
    vx, gx = jax.jit(jax.value_and_grad(e(evolve_product)))(coeff)
    np.testing.assert_allclose(float(vf), float(vx), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               rtol=1e-3, atol=1e-4)


def test_hop_mega_20q_molecule_on_chip():
    """Round 4: the palindromic-schedule hop mega engine
    (ops/fused_mega_hop.py) at 20 qubits — the molecule drive set
    {X, Y, hop chain, 37 ZZ rows = two sign bit-planes} with crossing
    hops through the relabeled low-free bits, REAL Mosaic lowering.
    The engine is a different 2nd-order integrator than the XLA product,
    so parity is checked against ITSELF across dt (second order) plus a
    finite-difference gradient probe; values vs XLA at matched dt agree
    to the splitting tolerance."""
    from tests.test_fused_hop import make_hop_problem

    n = 20
    pairs = [(i, i + 1) for i in range(n - 1)] + \
            [(i, i + 2) for i in range(n - 2)]
    ham, env, coeff, psi0, w = make_hop_problem(n, pairs, with_xy=True,
                                                seed=40, n_basis=3)
    from diffquantum_tpu.dynamics.product import fused_eligible
    assert fused_eligible(ham)
    T, n_steps = 1.0, 4

    # w rides as a jit ARGUMENT: a closed-over [2^20] f32 cost vector
    # would serialize as an 8 MiB dense constant (round-4 finding: big
    # constants ballooned this program to 14.7 MB of MLIR and the
    # compile helper was OOM-killed)
    def loss(c, wv):
        psi = evolve_product_fused(ham, env, c, psi0, 0.0, T, horizon=T,
                                   n_steps=n_steps)
        return jnp.sum(cpx.abs2(psi) * wv, axis=-1)

    v0, g = jax.jit(jax.value_and_grad(loss))(coeff, w)
    assert np.isfinite(float(v0))
    g = np.asarray(g)
    assert np.all(np.isfinite(g)) and np.linalg.norm(g) > 0
    # FD probe along one random direction (adjoint exactness on chip)
    rng = np.random.default_rng(41)
    direction = jnp.asarray(
        rng.standard_normal(coeff.shape).astype(np.float32))
    eps = 1e-3
    lj = jax.jit(loss)
    fd = (float(lj(coeff + eps * direction, w))
          - float(lj(coeff - eps * direction, w))) / (2 * eps)
    an = float(np.sum(g * np.asarray(direction)))
    assert abs(fd - an) < 5e-3 * max(1.0, abs(fd)), (fd, an)
    # value vs XLA product at matched dt: splitting-order tolerance
    def loss_x(c, wv):
        psi = evolve_product(ham, env, c, psi0, 0.0, T, horizon=T,
                             n_steps=n_steps)
        return jnp.sum(cpx.abs2(psi) * wv, axis=-1)
    vx = float(jax.jit(loss_x)(coeff, w))
    assert abs(float(v0) - vx) < 0.05 * max(1.0, abs(vx)), (float(v0), vx)


def test_mega_batched_seeds_20q_on_chip():
    """Round 4: the batched mega kernel — a 4-seed 20q population as ONE
    compiled kernel (grid (B, T+1)); values + grads vs the per-seed mega
    on chip."""
    from diffquantum_tpu.ops.fused_chunked import (
        chunked_evolve_mega, chunked_evolve_mega_batched)
    from tests.test_fused_chunked import _packed_args

    n, n_steps, bsz = 20, 3, 4
    prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=4,
                               dense=False)
    rng = np.random.default_rng(42)
    outs = []
    for s in range(bsz):
        c = jnp.asarray(rng.standard_normal(
            prob.envelope.coeff_shape).astype(np.float32) * 0.3)
        outs.append(_packed_args(prob, c, n_steps))
    ud_b = jnp.stack([o[0] for o in outs], axis=1)
    tx_b = jnp.stack([o[1] for o in outs], axis=1)
    h0th, signs, qubits, nq, kinds = outs[0][2:]
    psi_b = jax.tree_util.tree_map(lambda x: jnp.stack([x] * bsz),
                                   prob.psi0)
    w = prob.measurement.diag

    def loss_b(ud, tx):
        psi = chunked_evolve_mega_batched(psi_b, ud, tx, h0th, signs,
                                          qubits, nq, kinds, False)
        return jnp.sum(cpx.abs2(psi) * w)

    v_b, (gud_b, gtx_b) = jax.jit(
        jax.value_and_grad(loss_b, argnums=(0, 1)))(ud_b, tx_b)

    def loss_one(ud, tx, s):
        psi = chunked_evolve_mega(
            cpx.CP(psi_b.re[s], psi_b.im[s]), ud, tx, h0th, signs,
            qubits, nq, kinds, False)
        return jnp.sum(cpx.abs2(psi) * w)

    v_s = sum(float(jax.jit(lambda u, t, s=s: loss_one(u, t, s))(
        ud_b[:, s], tx_b[:, s])) for s in range(bsz))
    np.testing.assert_allclose(float(v_b), v_s, rtol=1e-5, atol=1e-6)
    assert np.all(np.isfinite(np.asarray(gud_b)))
    assert np.all(np.isfinite(np.asarray(gtx_b)))


def test_hop_mega_batched_seeds_20q_on_chip():
    """Round 5 (VERDICT r4 #4): a seed POPULATION through the batched
    hop-mega kernel — 8 seeds x 20q molecule drive set compiles as ONE
    program (grid (B, T+1)) and matches the per-seed hop-mega values on
    chip. Round 4 Python-looped this (one ~1 min mega compile per
    seed)."""
    from tests.test_fused_hop import make_hop_problem

    n, n_steps, bsz = 20, 3, 8
    pairs = [(i, i + 1) for i in range(n - 1)]
    ham, env, coeff, psi0, w = make_hop_problem(n, pairs, with_xy=True,
                                                seed=50, n_basis=3)
    rng = np.random.default_rng(51)
    coeffs = jnp.asarray(rng.standard_normal(
        (bsz,) + env.coeff_shape).astype(np.float32) * 0.3)
    psi_b = jax.tree_util.tree_map(lambda x: jnp.stack([x] * bsz), psi0)
    T = 1.0

    def loss_b(cs, wv):
        psi = evolve_product_fused(ham, env, cs, psi_b, 0.0, T, horizon=T,
                                   n_steps=n_steps)
        return jnp.sum(cpx.abs2(psi) * wv, axis=-1)  # [B]

    e_b, g_b = jax.jit(jax.value_and_grad(
        lambda cs, wv: loss_b(cs, wv).sum(), argnums=0))(coeffs, w)
    g_b = np.asarray(g_b)
    assert np.all(np.isfinite(g_b)) and np.linalg.norm(g_b) > 0
    e_each = np.asarray(jax.jit(loss_b)(coeffs, w))

    def loss_one(c, wv):
        psi = evolve_product_fused(ham, env, c, psi0, 0.0, T, horizon=T,
                                   n_steps=n_steps)
        return jnp.sum(cpx.abs2(psi) * wv, axis=-1)

    lj = jax.jit(loss_one)
    for s in (0, bsz - 1):  # two spot seeds; full sweep costs 8 dispatches
        np.testing.assert_allclose(float(lj(coeffs[s], w)),
                                   float(e_each[s]), rtol=1e-5, atol=1e-6)


def test_channel_18q_packed_on_chip():
    """Round 5 (VERDICT r4 #6): the carrier/two-quadrature channel model
    (`/root/reference/diffqc.cc:95-135`) THROUGH the 18q packed-phase
    kernels — previously chip-proven only at 12q on the streamed kernels.
    The channel amplitude tables must compose unchanged; checked by a
    finite-difference probe of the adjoint gradient on chip."""
    from tests.test_channel_structured import _ring_problem
    from diffquantum_tpu.dynamics.product import (fused_eligible,
                                                  select_engine)

    ham, env, vv, psi0, T = _ring_problem(18, jnp.float32, dense=False)
    assert fused_eligible(ham) and select_engine(ham) == "packed"
    n_steps = 4
    d = ham.dim
    w = jnp.arange(d, dtype=jnp.float32) / d

    def loss(c, wv):
        psi = evolve_product_fused(ham, env, c, psi0, 0.0, T, horizon=T,
                                   n_steps=n_steps)
        return jnp.sum(cpx.abs2(psi) * wv, axis=-1)

    v0, g = jax.jit(jax.value_and_grad(loss))(vv, w)
    assert np.isfinite(float(v0))
    g = np.asarray(g)
    assert np.all(np.isfinite(g)) and np.linalg.norm(g) > 0
    rng = np.random.default_rng(52)
    direction = jnp.asarray(
        rng.standard_normal(vv.shape).astype(np.float32))
    eps = 1e-3
    lj = jax.jit(loss)
    fd = (float(lj(vv + eps * direction, w))
          - float(lj(vv - eps * direction, w))) / (2 * eps)
    an = float(np.sum(g * np.asarray(direction)))
    assert abs(fd - an) < 5e-3 * max(1.0, abs(fd)), (fd, an)


def test_mc_estimator_18q_on_chip():
    """Round 4 (VERDICT #5): the paper's hardware-realistic MC gradient
    estimator at 18 qubits THROUGH the packed fused kernels, plus a
    sampled-measurement variant — previously chip-validated only to 12q.
    The MC estimator is unbiased with E[g_MC] ∝ dL/dc directionally; a
    fixed key gives a deterministic estimate whose dot product with the
    adjoint gradient must be positive and finite. The sample axis rides
    lax.map (sample_mode='auto' → 'map' at 18q): vmap cannot batch the
    packed kernels' ANY-space state buffers."""
    from diffquantum_tpu.gradients.mc import mc_energy_grad_batch

    prob = maxcut.build_maxcut(18, maxcut.ring_graph(18), n_basis=4,
                               dense=False)
    n_steps = 8
    c = _coeff(prob.envelope, seed=180, scale=0.3)

    def energy(cc):
        psi = evolve_product_fused(prob.ham, prob.envelope, cc, prob.psi0,
                                   0.0, prob.T, horizon=prob.T,
                                   n_steps=n_steps)
        return jnp.sum(cpx.abs2(psi) * prob.measurement.diag, axis=-1)

    g_adj = np.asarray(jax.jit(jax.grad(energy))(c))

    def mc_mean(cc, key, n_samples=8, sampling=False):
        return mc_energy_grad_batch(
            prob.ham, prob.envelope, prob.measurement, cc, prob.psi0,
            float(prob.T), key, n_steps, n_samples=n_samples,
            backend="product_fused", sampling=sampling)

    g_mc = np.asarray(jax.jit(
        lambda cc, k: mc_mean(cc, k))(c, jax.random.PRNGKey(7)))
    assert np.all(np.isfinite(g_mc)) and np.linalg.norm(g_mc) > 0
    cosine = float((g_mc * g_adj).sum()
                   / (np.linalg.norm(g_mc) * np.linalg.norm(g_adj) + 1e-30))
    assert cosine > 0.2, cosine  # unbiased estimator tracks the gradient

    g_mc_s = np.asarray(jax.jit(
        lambda cc, k: mc_mean(cc, k, sampling=True))(
            c, jax.random.PRNGKey(8)))
    assert np.all(np.isfinite(g_mc_s)) and np.linalg.norm(g_mc_s) > 0


def test_mega_frontier_2324q_on_chip():
    """The 23/24-qubit single-chip frontier: the single-call mega kernels
    (per-call chunked programs crashed the remote compile helper past
    22q; the mega form compiles in ~1 min — `_mega_vmem` raises the
    scoped window to 32 MiB at c >= 6). Values + grads vs the XLA
    product backend on chip at a few steps (the XLA path is safe for
    single steps at 16M amplitudes; only giant epoch blocks crash the
    worker)."""
    for n, n_steps in ((23, 4), (24, 3)):
        prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=4,
                                   dense=False)
        f_fused, f_xla = _energy_fns(prob, n_steps)
        c = _coeff(prob.envelope, seed=n)
        vf, gf = jax.jit(jax.value_and_grad(f_fused))(c)
        vx, gx = jax.jit(jax.value_and_grad(f_xla))(c)
        np.testing.assert_allclose(float(vf), float(vx), rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("n", [23, 24])
def test_mega_frontier_chained_grad_scan_on_chip(n):
    """The CHAINED-scan gradient shape at the 23/24q frontier — the shape
    that regressed twice without a test: BENCH_r03's 18q packed backward
    (42.62 vs 40 MiB) and BENCH_r04's 24q mega backward (24.74 vs
    24.00 MiB) both OOM'd scoped VMEM only when the grad step sat inside
    a `lax.scan` of updates (the production train-loop / bench shape),
    while the single-dispatch tests above stayed green. `_mega_vmem`
    grants 32 MiB at c >= 6; this test pins that window against the
    transpose-of-scan lowering on chip so it cannot silently shrink
    relative to the backward's appetite again."""
    prob = maxcut.build_maxcut(n, maxcut.ring_graph(n), n_basis=4,
                               dense=False)
    f_fused, _ = _energy_fns(prob, 3)
    c = _coeff(prob.envelope, seed=100 + n)
    grad_step = jax.value_and_grad(f_fused)

    @jax.jit
    def chained(c0):
        def body(cc, _):
            _, g = grad_step(cc)
            return cc - 1e-6 * g, None
        out, _ = jax.lax.scan(body, c0, None, length=3)
        return out

    out = jax.block_until_ready(chained(c))
    assert np.all(np.isfinite(np.asarray(out)))
