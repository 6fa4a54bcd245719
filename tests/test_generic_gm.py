"""Group-major matmul engine (engines/generic_gm) vs the classic path.

The gm engine restructures generic.py's update families around MXU matmuls;
these tests pin its weight evaluation, per-site flip deltas, whole-proposal
deltas, and estimators against the classic select-chain path on the hard term
mix (TFIM + XX + ZZZ: off-diagonal 2-local and 3-local classes), then re-run
an exact-diagonalization physics check end-to-end through sweep_gm.
Reference capability: /root/reference/src/qmcrunner.rs:94-135, :161-201.
"""

from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyisingmontecarlo_tpu.engines import generic as ge
from pyisingmontecarlo_tpu.engines import generic_gm as gg
from pyisingmontecarlo_tpu.rng import MasterRng, keys_from_seeds, split_keys


def hard_terms(n, gamma=1.0, jx=0.5, k3=0.25):
    ts = ge.TermSet(n)

    def zz(j):
        out = np.zeros(4)
        for idx in range(4):
            z0 = 1.0 if idx & 1 else -1.0
            z1 = 1.0 if idx & 2 else -1.0
            out[idx] = j * z0 * z1
        return out

    def xx(jxv):
        m = np.zeros((4, 4))
        for a in range(4):
            m[a, a ^ 3] = -jxv
        return m.reshape(-1)

    def zzz(k):
        out = np.zeros(8)
        for idx in range(8):
            z = [1.0 if idx & (1 << b) else -1.0 for b in range(3)]
            out[idx] = k * z[0] * z[1] * z[2]
        return out

    for i in range(n):
        ts.add(zz(-1.0), [i, (i + 1) % n], True, False)
        ts.add(np.array([0.0, -gamma, -gamma, 0.0]), [i], False, False)
        ts.add(xx(jx), [i, (i + 1) % n], False, False)
        if k3:
            ts.add(zzz(k3), [i, (i + 1) % n, (i + 2) % n], True, False)
    return ts


def random_worldline(comp, n, R, lt, seed=0):
    """A worldline with sprinkled kinks (may contain forbidden transfers —
    useful for exercising floor bookkeeping)."""
    G = comp.G
    Lt = lt * G
    rng = np.random.default_rng(seed)
    s = np.repeat(
        rng.choice(np.array([-1, 1], np.int8), size=(R, n, 1)), Lt, axis=2
    )
    for _ in range(3 * n):
        r, v = rng.integers(R), rng.integers(n)
        l0 = rng.integers(Lt)
        ln = rng.integers(1, Lt)
        idx = (np.arange(Lt) - l0) % Lt < ln
        s[r, v, idx] *= -1
    return s


def _clamp(x):
    # any delta below -80 is acceptance-equivalent (sigmoid == 0 in f32);
    # forbidden-path bookkeeping may stack different numbers of _NEG floors
    return np.clip(x, -80.0, 80.0)


@pytest.fixture(scope="module")
def setup():
    n, R, lt = 8, 4, 6
    ts = hard_terms(n)
    comp = ge.compile_terms(n, ts.terms, 0.1)
    gs = gg.compile_gm(comp, n)
    s = random_worldline(comp, n, R, lt, seed=3)
    return n, R, lt, comp, gs, s


def test_weight_plane_matches_classic(setup):
    n, R, lt, comp, gs, s = setup
    G = comp.G
    Lt = lt * G
    g_of_l = np.arange(Lt) % G
    gm = gg.to_gm(jnp.asarray(s), G)
    lw = np.asarray(gg.lw_plane(gs, gm, R))
    sj = jnp.asarray(s)
    for ci, cls in enumerate(comp.classes):
        ref = np.asarray(ge._term_logw(cls, sj, g_of_l))  # [R, T, Lt]
        for tt, (cj, j) in enumerate(gs.host.rows):
            if cj != ci:
                continue
            g = int(cls.group[j])
            got = lw[tt].reshape(lt, R)
            want = ref[:, j, g::G].T
            np.testing.assert_allclose(got, want, atol=1e-5)


def test_roundtrip_layout(setup):
    n, R, lt, comp, gs, s = setup
    gm = gg.to_gm(jnp.asarray(s), comp.G)
    back = np.asarray(gg.from_gm(gm, comp.G, n, R))
    np.testing.assert_array_equal(back, s)


def test_site_deltas_match_classic(setup):
    n, R, lt, comp, gs, s = setup
    G = comp.G
    Lt = lt * G
    sj = jnp.asarray(s)
    gm = gg.to_gm(sj, G)
    for parity in (0, 1):
        tpar = (np.arange(Lt) % 2) == parity
        for c in range(len(comp.color_sites)):
            pp = jnp.asarray(gg._parity_plane(G, n, lt, R, parity))
            crow = gg._tile_rows(
                jnp.asarray(gs.host.color_rows[c])[:, None], G
            )
            D, _, _ = gg.site_deltas(gs, gm, pp * crow, R)
            D = np.asarray(D)
            sites = comp.color_sites[c]
            si = jnp.take(sj, sites, axis=1)
            s_new = sj.at[:, sites].set(
                jnp.where(jnp.asarray(tpar)[None, None, :], -si, si)
            )
            d = np.asarray(ge._flip_delta_per_site(comp, sj, s_new, c))
            dpos = np.roll(d, 1, axis=2) + d  # [R, Cc, Lt]
            m = tpar.reshape(lt, G).T  # parity on (g', c')
            for jj, v in enumerate(sites):
                got = D[np.arange(G) * n + v].reshape(G, lt, R)
                want = dpos[:, jj, :].T.reshape(lt, G, R).transpose(1, 0, 2)
                np.testing.assert_allclose(
                    np.where(m[:, :, None], _clamp(got), 0.0),
                    np.where(m[:, :, None], _clamp(want), 0.0),
                    atol=3e-4, rtol=1e-4,
                )


def test_total_deltas_match_classic_interval(setup):
    n, R, lt, comp, gs, s = setup
    G = comp.G
    Lt = lt * G
    sj = jnp.asarray(s)
    gm = gg.to_gm(sj, G)
    rng = np.random.default_rng(11)
    for c in range(len(comp.color_sites)):
        sites = comp.color_sites[c]
        # random interval proposal per (var, replica), classic mask geometry
        l1 = rng.integers(0, Lt, size=(n, R)).astype(np.float32)
        ln = rng.integers(0, Lt, size=(n, R)).astype(np.float32)
        crow = jnp.asarray(gs.host.color_rows[c])[:, None]
        m = gg._interval_mask(gs, jnp.asarray(l1), jnp.asarray(ln), lt, R)
        m = m * gg._tile_rows(jnp.broadcast_to(crow, (n, lt * R)), G)
        D, _, _ = gg.total_deltas(gs, gm, m, R)
        D = np.asarray(D)  # [n, R]
        pos = np.arange(Lt)[None, None, :]
        mask = ((pos - l1[sites][:, :, None]) % Lt) < ln[sites][:, :, None]
        mask = np.transpose(mask, (1, 0, 2))  # [R, Cc, Lt]
        si = jnp.take(sj, sites, axis=1)
        s_new = sj.at[:, sites].set(jnp.where(jnp.asarray(mask), -si, si))
        want = np.asarray(
            ge._flip_delta_per_site(comp, sj, s_new, c).sum(-1)
        )  # [R, Cc]
        np.testing.assert_allclose(
            _clamp(D[sites].T), _clamp(want), atol=3e-4, rtol=1e-4
        )


def test_energy_and_op_counts_match_classic(setup):
    n, R, lt, comp, gs, s = setup
    G = comp.G
    sj = jnp.asarray(s)
    gm = gg.to_gm(sj, G)
    e_gm = np.asarray(gg.energy_gm(gs, gm, R, lt, offset=1.25))
    e_cl = np.asarray(ge.total_energy(comp, sj, lt, offset=1.25))
    np.testing.assert_allclose(e_gm, e_cl, atol=1e-3, rtol=1e-5)
    offsets = np.linspace(0.5, 1.5, comp.nterms).astype(np.float32)
    oc_gm = np.asarray(gg.term_op_counts_gm(gs, gm, R, lt, 0.7, offsets))
    oc_cl = np.asarray(ge.term_op_counts(comp, sj, lt, 0.7, offsets))
    np.testing.assert_allclose(oc_gm, oc_cl, atol=1e-3, rtol=1e-5)


def test_sweep_gm_reproduces_exact_energy():
    """4-site TFIM + XX chain vs dense diagonalization of the SAME
    discretized (Trotterized) Z — the gm sweep must sample the identical
    distribution as the classic engine (which passes this check in
    test_qmcrunner.py)."""
    # dtau deliberately coarse (0.125): kink acceptance ~ (gamma*dtau)^2,
    # and the comparison target is the transfer-matrix value of the SAME
    # discretized Z, so Trotter bias cancels exactly
    n, R, lt = 4, 64, 8
    beta, gamma, jx = 1.0, 0.9, 0.4
    ts = hard_terms(n, gamma=gamma, jx=jx, k3=0.0)
    dtau = beta / lt
    comp = ge.compile_terms(n, ts.terms, dtau)
    gs = gg.compile_gm(comp, n)
    kinks = gg.compile_gm_kinks(comp, gs)
    G = comp.G

    s = np.ones((R, n, lt * G), np.int8)
    gm = gg.to_gm(jnp.asarray(s), G)
    keys = keys_from_seeds(MasterRng(17).make_seeds(R))

    @partial(jax.jit, static_argnums=(2, 3))
    def run(gm, keys, nsweeps, collect):
        def body(carry, _):
            gm, keys = carry
            gm, keys = gg.sweep_gm(gs, kinks, comp, gm, keys, R, False)
            e = gg.energy_gm(gs, gm, R, lt, 0.0) if collect else 0.0
            return (gm, keys), e

        (gm, keys), es = jax.lax.scan(body, (gm, keys), None, length=nsweeps)
        return gm, keys, es

    gm, keys, _ = run(gm, keys, 1500, False)  # equilibrate
    gm, keys, es = run(gm, keys, 1500, True)
    es = np.asarray(es)  # [T, R]

    # exact value of the SAME Trotterized partition function via transfer
    # matrices (the engine should match it to statistical error, with zero
    # additional bias)
    import itertools

    terms = ts.terms
    groups = ge._group_terms(terms)
    Gn = int(groups.max()) + 1
    dim = 2**n
    Tg = [np.eye(dim) for _ in range(Gn)]
    Hg = [np.zeros((dim, dim)) for _ in range(Gn)]
    for t, g in zip(terms, groups):
        m = t["mat"]
        full = np.zeros((dim, dim))
        for a in range(dim):
            for b in range(dim):
                amp = 1.0
                ai = sum(
                    ((a >> v) & 1) << slot for slot, v in enumerate(t["vars"])
                )
                bi = sum(
                    ((b >> v) & 1) << slot for slot, v in enumerate(t["vars"])
                )
                same = all(
                    ((a >> v) & 1) == ((b >> v) & 1)
                    for v in range(n)
                    if v not in t["vars"]
                )
                if same:
                    full[a, b] += m[ai, bi]
        Hg[g] += full
    W = np.eye(dim)
    for g in range(Gn):
        Tg[g] = ge.expm(-dtau * Hg[g])
    slab = np.eye(dim)
    for g in range(Gn):
        slab = Tg[g] @ slab
    Z = np.trace(np.linalg.matrix_power(slab, lt))
    # <E> = -dlnZ/dbeta at fixed lt: finite-difference in dtau
    eps = 1e-6
    def z_at(dt):
        slab = np.eye(dim)
        for g in range(Gn):
            slab = ge.expm(-dt * Hg[g]) @ slab
        return np.trace(np.linalg.matrix_power(slab, lt))

    e_exact = -(np.log(z_at(dtau + eps)) - np.log(z_at(dtau - eps))) / (
        2 * eps * lt
    )
    em = es.mean()
    se = es.mean(axis=0).std(ddof=1) / np.sqrt(R)
    assert abs(em - e_exact) < 5 * se + 0.05, (em, e_exact, se)


def test_subset_site_deltas_match_full(setup):
    """The per-color column-subset site deltas (round-5 throughput path,
    _site_deltas_sub) must equal the full-TT path at every masked position:
    subsetting drops only terms whose dlw is identically zero for that
    color's flips (conflict coloring)."""
    n, R, lt, comp, gs, s = setup
    G = comp.G
    gm = gg.to_gm(jnp.asarray(s), G)
    for c in range(len(comp.color_sites)):
        for parity in (0, 1):
            pp = gg._parity_plane(G, n, lt, R, parity)
            crow = gg._tile_rows(jnp.asarray(gs.host.color_rows[c])[:, None], G)
            m = pp * crow
            D_full, gmn_full, _ = gg.site_deltas(gs, gm, m, R)
            D_sub, gmn_sub = gg._site_deltas_sub(gs, gs.csub[c], gm, m, R)
            np.testing.assert_array_equal(np.asarray(gmn_sub), np.asarray(gmn_full))
            mm = np.asarray(m) > 0
            np.testing.assert_allclose(
                np.where(mm, np.clip(np.asarray(D_sub), -80, 80), 0.0),
                np.where(mm, np.clip(np.asarray(D_full), -80, 80), 0.0),
                atol=3e-4, rtol=1e-4,
            )


def test_subset_total_deltas_match_full(setup):
    n, R, lt, comp, gs, s = setup
    G = comp.G
    Lt = float(lt * G)
    gm = gg.to_gm(jnp.asarray(s), G)
    rng = np.random.default_rng(9)
    for c in range(len(comp.color_sites)):
        crow = jnp.asarray(gs.host.color_rows[c])[:, None]
        l1 = jnp.asarray(rng.integers(0, int(Lt), size=(n, R)).astype(np.float32))
        ln = jnp.asarray(rng.integers(1, int(Lt), size=(n, R)).astype(np.float32))
        vsel = jnp.broadcast_to(crow, (n, lt * R))
        m = gg._interval_mask(gs, l1, ln, lt, R) * gg._tile_rows(vsel, G)
        D_full, gmn_full, _ = gg.total_deltas(gs, gm, m, R)
        D_sub, gmn_sub = gg._total_deltas_sub(gs, gs.csub[c], gm, m, R)
        np.testing.assert_array_equal(np.asarray(gmn_sub), np.asarray(gmn_full))
        sel = np.asarray(gs.host.color_rows[c]) > 0
        np.testing.assert_allclose(
            np.clip(np.asarray(D_sub)[sel], -80, 80),
            np.clip(np.asarray(D_full)[sel], -80, 80),
            atol=3e-4, rtol=1e-4,
        )
