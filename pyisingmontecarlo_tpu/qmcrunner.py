"""``QmcRunner`` — stateful QMC ensemble over arbitrary k-local interactions.

Parity target: /root/reference/src/qmcrunner.rs:21-407 (method table in
SURVEY.md section 2.2). The reference wraps the generic SSE engine
``qmc::sse::Qmc``: the Hamiltonian is a sum of arbitrary k-local terms given
as flattened 2^k x 2^k matrices over listed variable subsets, with
``_and_offset`` variants shifting matrices to non-negative weights and
accumulating the scalar offset (qmcrunner.rs:104-135). Here the backend is the
Trotterized generic worldline engine (engines/generic.py).

Notes on parity:
- ``nvars`` is explicit (not inferred from edges) and initial states are
  random (qmcrunner.rs:35-69).
- ``add_qmc`` replays all recorded interactions onto the new instance
  (qmcrunner.rs:86-88) — here interactions are container state, so appending a
  replica automatically shares them.
- interactions may be added at any time, including between runs: the reference
  applies a new interaction to all existing simulators (qmcrunner.rs:94-101);
  here the worldline grid is recompiled from the new term set and the current
  configuration regridded onto it (engines/generic.regrid_worldline).
- no checkpointing, matching the reference (SURVEY.md section 2.1 row 5).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .engines import classical as ce
from .engines import generic as ge
from .rng import MasterRng, keys_from_seeds

__all__ = ["QmcRunner"]


class QmcRunner:
    """Persistent ensemble of generic k-local-interaction QMC simulators.

    Constructor parity: ``QmcRunner(nvars, num_experiments, seed?,
    use_allocator?=true, do_loop_updates?=false, do_heatbath_updates?=false)``
    (qmcrunner.rs:35-62). ``use_allocator`` is accepted and ignored (TPU
    storage is dense); ``do_heatbath_updates`` selects heatbath acceptance in
    the reference's diagonal update — our colored Metropolis sweeps keep the
    flag for parity (it does not change the sampled distribution)."""

    def __init__(
        self,
        nvars: int,
        num_experiments: int,
        seed: Optional[int] = None,
        use_allocator: bool = True,
        do_loop_updates: bool = False,
        do_heatbath_updates: bool = False,
        *,
        dtau: Optional[float] = None,
    ):
        self.nvars = int(nvars)
        if self.nvars <= 0:
            raise ValueError("nvars must be positive")
        self.rng = MasterRng(seed)
        self.use_allocator = bool(use_allocator)
        self.do_loop_updates = bool(do_loop_updates)
        self.do_heatbath_updates = bool(do_heatbath_updates)
        # Trotter-step target (framework extension; None -> PMC_DTAU env ->
        # engine default). The reference's SSE is Trotter-bias-free
        # (qmcising.rs:37-143); see docs/DESIGN.md "Trotter error control".
        self.dtau = dtau
        self.terms = ge.TermSet(self.nvars)
        self._keys = None
        self._init_states = None  # [R, nvars] int8 random starts (qmcrunner.rs:69)
        self._w: Optional[ge.GenericWorldline] = None
        for _ in range(int(num_experiments)):
            self.add_qmc()

    # ------------------------------------------------------------------ build

    @property
    def num_graphs(self) -> int:
        if self._w is not None:
            return int(self._w.s.shape[0])
        return 0 if self._keys is None else int(self._keys.shape[0])

    def add_qmc(self, use_allocator: Optional[bool] = None) -> None:
        """qmcrunner.rs:65-91 — append one simulator with a random initial
        spin state, seeded from the container RNG."""
        key = keys_from_seeds(self.rng.make_seeds(1))
        s0 = ce.random_states(key, self.nvars)
        if self._w is not None:
            sw = jnp.broadcast_to(s0[:, :, None], (1, self.nvars, self._w.Lt))
            self._w.s = jnp.concatenate([self._w.s, sw], axis=0)
            self._w.keys = jnp.concatenate([self._w.keys, key], axis=0)
        elif self._keys is None:
            self._keys, self._init_states = key, s0
        else:
            self._keys = jnp.concatenate([self._keys, key], axis=0)
            self._init_states = jnp.concatenate([self._init_states, s0], axis=0)

    def _recompile(self) -> None:
        """Apply a term-set change to already-materialized simulators.

        The reference applies new interactions to every *existing* simulator
        mid-run (qmcrunner.rs:94-101 iterates ``self.qmc`` calling
        ``make_interaction``) — a program that builds its Hamiltonian
        incrementally between equilibration runs must keep its state. Here the
        worldline grid is recompiled from the new term set and the current
        configuration is regridded onto it (engines/generic.regrid_worldline)."""
        old = self._w
        if old is None:
            return
        self._w = ge.GenericWorldline(
            self.terms, old.beta, old.keys, old.s[:, :, 0], self.do_loop_updates,
            dtau_target=self.dtau,
        )
        self._w.s = jnp.asarray(
            ge.regrid_worldline(old.s, self._w.comp, self._w.Lt), old.s.dtype
        )

    def add_interaction(self, mat: Sequence[float], vars: Sequence[int]) -> None:
        """qmcrunner.rs:94-101 — flattened 2^k x 2^k matrix over k variables."""
        self.terms.add(mat, vars, diagonal=False, with_offset=False)
        self._recompile()

    def add_interaction_and_offset(self, mat: Sequence[float], vars: Sequence[int]) -> None:
        """qmcrunner.rs:104-111 — shifts the matrix to non-negative weights and
        tracks the offset."""
        self.terms.add(mat, vars, diagonal=False, with_offset=True)
        self._recompile()

    def add_diagonal_interaction(self, mat: Sequence[float], vars: Sequence[int]) -> None:
        """qmcrunner.rs:114-121 — 2^k diagonal."""
        self.terms.add(mat, vars, diagonal=True, with_offset=False)
        self._recompile()

    def add_diagonal_interaction_and_offset(self, mat, vars) -> None:
        """qmcrunner.rs:124-135."""
        self.terms.add(mat, vars, diagonal=True, with_offset=True)
        self._recompile()

    def set_do_heatbath(self, enable: bool) -> None:
        """qmcrunner.rs:138-143."""
        self.do_heatbath_updates = bool(enable)

    def set_do_loop_updates(self, enable: bool) -> None:
        """qmcrunner.rs:145-151."""
        self.do_loop_updates = bool(enable)
        if self._w is not None:
            self._w.do_loop = self.do_loop_updates

    def _ensure(self, beta: float) -> ge.GenericWorldline:
        if self._w is None:
            self._w = ge.GenericWorldline(
                self.terms,
                float(beta),
                self._keys,
                self._init_states,
                self.do_loop_updates,
                dtau_target=self.dtau,
            )
            self._keys = self._init_states = None
        elif float(beta) != self._w.beta:
            # Regrid to the new beta preserving the full worldline: the
            # reference's SSE state survives any `beta` change (the operator
            # string is reused verbatim, qmcrunner.rs:161-201 just passes the
            # new beta into timesteps). Here the tau-grid length tracks beta,
            # so resample every slice to its nearest position on the new grid
            # (kinks survive; same scheme as QmcIsing._ensure). Duplicated
            # slices are diagonal segments and dropped slices lose only the
            # kinks between them — both valid configurations the sweep then
            # re-equilibrates.
            old = self._w
            self._w = ge.GenericWorldline(
                self.terms, float(beta), old.keys, old.s[:, :, 0], self.do_loop_updates,
                dtau_target=self.dtau,
            )
            if self._w.Lt == old.Lt:
                self._w.s = old.s
            else:
                idx = (np.arange(self._w.Lt) * old.Lt // self._w.Lt).astype(np.int32)
                self._w.s = jnp.take(old.s, jnp.asarray(idx), axis=2)
        self._w.do_loop = self.do_loop_updates
        return self._w

    # ------------------------------------------------------------------- runs

    def run_sampling(
        self,
        beta: float,
        timesteps: int,
        sampling_wait_buffer: Optional[int] = None,
        sampling_freq: Optional[int] = None,
    ):
        """qmcrunner.rs:161-201 -> (energies[n], states[n, t/freq, nvars])."""
        wait = min(int(sampling_wait_buffer or 0), int(timesteps))
        freq = int(sampling_freq) if sampling_freq else 1
        if self.num_graphs == 0:
            # empty container: no-op, empty-shaped results (the reference
            # iterates an empty Vec)
            return (
                np.zeros(0, np.float64),
                np.zeros((0, int(timesteps) // freq, self.nvars), bool),
            )
        w = self._ensure(beta)
        if wait:
            w.timesteps(wait)
        es, ss = w.timesteps_sample(int(timesteps), freq)
        return np.asarray(es, np.float64), ss

    def run_bond_sampling(
        self,
        beta: float,
        timesteps: int,
        sampling_wait_buffer: Optional[int] = None,
        sampling_freq: Optional[int] = None,
    ):
        """qmcrunner.rs:211-248 -> counts[n, t/freq, nbonds] int; nbonds is the
        number of added interactions (qmcrunner.rs:221)."""
        wait = min(int(sampling_wait_buffer or 0), int(timesteps))
        freq = int(sampling_freq) if sampling_freq else 1
        if self.num_graphs == 0:
            return np.zeros(
                (0, int(timesteps) // freq, len(self.terms.terms)), np.int64
            )
        w = self._ensure(beta)
        if wait:
            w.timesteps(wait)
        _, counts = w.bond_sample(int(timesteps), freq)
        return counts

    def _autocorr(self, beta, timesteps, wait, freq, series_fn):
        """Autocorrelation of the freq-sampled series, zero-padded into the
        [n, timesteps] output (reference quirk, SURVEY.md 2.4.2; the reference
        forwards sampling_freq to calculate_*_autocorrelation,
        qmcrunner.rs:267-284). The sample series stays on device: channel
        products + FFT run there and only rho[R, T'] crosses to host
        (matches Lattice/QmcIsing/LatticeTempering; VERDICT round-4 weak 3)."""
        from .engines.observables import autocorrelation_device, pad_autocorr

        if self.num_graphs == 0:
            return np.zeros((0, int(timesteps)), np.float64)
        w = self._ensure(beta)
        if wait:
            w.timesteps(int(wait))
        _, samples = w.timesteps_sample_dev(int(timesteps), int(freq))
        x = jnp.asarray(samples, jnp.float32)  # +-1 device series [R, T', n]
        return pad_autocorr(autocorrelation_device(series_fn(x)), int(timesteps))

    def run_quantum_monte_carlo_and_measure_variable_autocorrelation(
        self,
        beta: float,
        timesteps: int,
        sampling_wait_buffer: Optional[int] = None,
        sampling_freq: Optional[int] = None,
    ):
        """qmcrunner.rs:258-284 -> corrs[n, timesteps]."""
        freq = int(sampling_freq) if sampling_freq else 1
        return np.asarray(
            self._autocorr(beta, timesteps, sampling_wait_buffer, freq, lambda x: x),
            np.float64,
        )

    def run_quantum_monte_carlo_and_measure_spin_product_autocorrelation(
        self,
        beta: float,
        timesteps: int,
        spin_products: Sequence[Sequence[int]],
        sampling_wait_buffer: Optional[int] = None,
        sampling_freq: Optional[int] = None,
    ):
        """qmcrunner.rs:295-330 -> corrs[n, timesteps]."""
        for sub in spin_products:
            for v in sub:
                if int(v) < 0 or int(v) >= self.nvars:
                    raise ValueError(f"Spin product variable {v} out of bounds")
        freq = int(sampling_freq) if sampling_freq else 1
        return np.asarray(
            self._autocorr(
                beta,
                timesteps,
                sampling_wait_buffer,
                freq,
                lambda x: jnp.stack(
                    [jnp.prod(x[:, :, list(sub)], axis=2) for sub in spin_products],
                    axis=2,
                ),
            ),
            np.float64,
        )

    def run_quantum_monte_carlo_and_measure_bond_autocorrelation(
        self,
        beta: float,
        timesteps: int,
        sampling_wait_buffer: Optional[int] = None,
        sampling_freq: Optional[int] = None,
    ):
        """qmcrunner.rs:340-365 -> corrs[n, timesteps] over per-interaction
        diagonal energy series. The [R, T', nterms] count series is built and
        reduced on device (autocorrelation_device); only rho crosses to host."""
        from .engines.observables import autocorrelation_device, pad_autocorr

        freq = int(sampling_freq) if sampling_freq else 1
        if self.num_graphs == 0:
            return np.zeros((0, int(timesteps)), np.float64)
        w = self._ensure(beta)
        if sampling_wait_buffer:
            w.timesteps(int(sampling_wait_buffer))
        _, counts = w.bond_sample_dev(int(timesteps), freq)
        # match the host path's integer quantization (counts are rounded to
        # int before correlating there)
        series = jnp.maximum(jnp.rint(jnp.asarray(counts, jnp.float32)), 0.0)
        return pad_autocorr(autocorrelation_device(series), int(timesteps))

    # ------------------------------------------------------------ inspection

    def get_offset(self) -> float:
        """qmcrunner.rs:368-374 — accumulated constant offset."""
        return float(self.terms.offset)

    def get_graph_itime(self, g: int) -> np.ndarray:
        """qmcrunner.rs:377-401 -> bool[Lt, nvars]."""
        g = int(g)
        if g < 0 or g >= self.num_graphs:
            raise ValueError(f"Graph index {g} out of bounds")
        if self._w is None:
            self._ensure(1.0)
        return self._w.itime_states(g)

    def clone(self) -> "QmcRunner":
        """qmcrunner.rs:404-406."""
        other = QmcRunner.__new__(QmcRunner)
        other.__dict__.update(self.__dict__)
        other.rng = self.rng.clone()
        other.terms = self.terms.clone()
        if self._w is not None:
            w = ge.GenericWorldline.__new__(ge.GenericWorldline)
            w.__dict__.update(self._w.__dict__)
            other._w = w
        return other
