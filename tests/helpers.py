"""Shared exact-solution helpers for tests."""

import itertools

import numpy as np


def dense_tfim_energy(edges, h, gamma, beta, nvars):
    """<E> at inverse temperature beta for H = sum J sz sz + h sum sz - Gamma
    sum sx by dense diagonalization (the sign of the Gamma term is a gauge
    choice; the spectrum — hence <E> — is identical either way)."""
    dim = 2**nvars
    H = np.zeros((dim, dim))
    sz = lambda i, st: 1.0 - 2.0 * ((st >> i) & 1)
    for st in range(dim):
        d = sum(j * sz(a, st) * sz(b, st) for (a, b), j in edges) + h * sum(
            sz(i, st) for i in range(nvars)
        )
        H[st, st] = d
        for i in range(nvars):
            H[st ^ (1 << i), st] += -gamma
    w = np.linalg.eigvalsh(H)
    zw = np.exp(-beta * (w - w.min()))
    return float((w * zw).sum() / zw.sum())


def dense_tfim_magnetization(edges, h, gamma, beta, nvars):
    """Thermal <sz_i> vector by dense diagonalization."""
    dim = 2**nvars
    H = np.zeros((dim, dim))
    sz = lambda i, st: 1.0 - 2.0 * ((st >> i) & 1)
    for st in range(dim):
        H[st, st] = sum(j * sz(a, st) * sz(b, st) for (a, b), j in edges) + h * sum(
            sz(i, st) for i in range(nvars)
        )
        for i in range(nvars):
            H[st ^ (1 << i), st] += -gamma
    w, v = np.linalg.eigh(H)
    zw = np.exp(-beta * (w - w.min()))
    rho_diag = (v**2 * zw[None, :]).sum(1) / zw.sum()  # P(st)
    out = np.zeros(nvars)
    for i in range(nvars):
        vals = np.array([sz(i, st) for st in range(dim)])
        out[i] = float(vals @ rho_diag)
    return out


def dense_terms_energy(nvars, terms, beta):
    """<E> by dense diagonalization for H = sum_t M_t, with each M_t a
    (symmetric) 2^k x 2^k matrix over a variable subset. Bit conventions match
    QmcRunner (tests/test_qmcrunner.py header): local index = sum_m bit_m << m
    with bit_m = 1 when the m-th listed variable is up; global basis state bit
    v = 1 when variable v is up."""
    dim = 2**nvars
    H = np.zeros((dim, dim))
    for mat, vs in terms:
        k = len(vs)
        mat = np.asarray(mat, np.float64).reshape(2**k, 2**k)
        for st in range(dim):
            idx_in = sum(((st >> vs[m]) & 1) << m for m in range(k))
            for idx_out in range(2**k):
                if mat[idx_in, idx_out] == 0.0:
                    continue
                st_out = st
                for m in range(k):
                    bit = (idx_out >> m) & 1
                    st_out = (st_out & ~(1 << vs[m])) | (bit << vs[m])
                H[st_out, st] += mat[idx_in, idx_out]
    w = np.linalg.eigvalsh(H)
    zw = np.exp(-beta * (w - w.min()))
    return float((w * zw).sum() / zw.sum())


def exact_classical_stats(edges, bias, beta):
    nvars = max(max(a, b) for (a, b), _ in edges) + 1
    h = np.asarray(bias) if np.ndim(bias) else np.full(nvars, float(bias))
    ws, Es = [], []
    for conf in itertools.product([-1, 1], repeat=nvars):
        s = np.array(conf)
        E = sum(j * s[a] * s[b] for (a, b), j in edges) + float(h @ s)
        Es.append(E)
        ws.append(np.exp(-beta * E))
    ws = np.array(ws)
    return float(np.dot(ws, Es) / ws.sum())
