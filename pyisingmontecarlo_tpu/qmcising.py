"""``QmcIsing`` — stateful transverse-field Ising QMC ensemble.

Parity target: /root/reference/src/qmcising.rs:37-513 (method table in
SURVEY.md section 2.2). The reference keeps a persistent
``Vec<QmcIsingGraph>`` of SSE simulators and exposes the individual SSE move
families; here the ensemble is one batched worldline array (engines/worldline)
and the move families map as:

- ``run_qmc``       -> full sweeps (site updates + FK time-clusters [+ rvb])
- ``run_diagonal``  -> colored single-site space-time sweeps only
  (qmcising.rs:146-151 ``single_diagonal_step``)
- ``run_cluster``   -> one FK time-line cluster per experiment, returning its
  size (qmcising.rs:154-165 ``single_cluster_step``)
- ``run_rvb``       -> whole-worldline edge pair-flip sweeps, returning
  success ratios (qmcising.rs:168-190 ``single_rvb_sweep``)

Because SSE has no Trotter grid, ``beta`` enters only at run time; the
worldline grid is materialized lazily at the first run and **regridded**
(nearest-slice resampling) if a later call changes beta enough to change the
slice count.

Checkpointing (qmcising.rs:448-512): CBOR tuple mirroring the reference's
``FileType`` (qmcising.rs:22-32); RNG state is deliberately NOT saved — reload
reseeds (qmcising.rs:485-486 semantics).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .engines import classical as ce
from .engines import worldline as wl
from .engines.observables import pad_autocorr
from .graph import compile_graph
from .rng import MasterRng, keys_from_seeds
from .utils import cbor

__all__ = ["QmcIsing"]


class QmcIsing:
    """Persistent ensemble of transverse-field Ising QMC simulators.

    Constructor parity: ``QmcIsing(edges, transverse, longitudinal?=0.0,
    num_experiments?=1, seed?, use_allocator?=true, do_heatbath_updates?=false,
    do_rvb_updates?=false)`` (qmcising.rs:53-94). ``use_allocator`` is accepted
    for parity and ignored (TPU storage is preallocated dense arrays)."""

    def __init__(
        self,
        edges: Sequence,
        transverse: float,
        longitudinal: float = 0.0,
        num_experiments: int = 1,
        seed: Optional[int] = None,
        use_allocator: bool = True,
        do_heatbath_updates: bool = False,
        do_rvb_updates: bool = False,
        *,
        dtau: Optional[float] = None,
    ):
        self.edges = [((int(a), int(b)), float(j)) for (a, b), j in edges]
        self.cg = compile_graph(self.edges)
        self.nvars = self.cg.nvars
        self.transverse = float(transverse)
        if self.transverse <= 0:
            raise ValueError("Transverse field must be positive for QMC")
        self.longitudinal = float(longitudinal)
        self.seed = seed
        self.rng = MasterRng(seed)
        self.use_allocator = bool(use_allocator)
        self.enable_heatbath = bool(do_heatbath_updates)
        self.enable_rvb = bool(do_rvb_updates)
        # Trotter-step target (framework extension; None -> PMC_DTAU env ->
        # engine default). The reference's SSE is Trotter-bias-free
        # (qmcising.rs:37-143); see docs/DESIGN.md "Trotter error control".
        self.dtau = dtau
        self._keys = None  # [R] typed keys (pre-materialization)
        self._init_states = None  # [R, nvars] int8
        self._w: Optional[wl.WorldlineEnsemble] = None
        for _ in range(int(num_experiments)):
            self.add_qmc()

    # ------------------------------------------------------------------ state

    @property
    def num_graphs(self) -> int:
        if self._w is not None:
            return self._w.R
        return 0 if self._keys is None else int(self._keys.shape[0])

    def add_qmc(self, use_allocator: Optional[bool] = None) -> None:
        """qmcising.rs:97-121 — append one simulator seeded from the container
        RNG, with a random initial spin state."""
        key = keys_from_seeds(self.rng.make_seeds(1))
        s0 = ce.random_states(key, self.nvars)  # [1, nvars] int8
        if self._w is not None:
            sw = jnp.broadcast_to(s0[:, :, None], (1, self.nvars, self._w.L))
            self._w.s = jnp.concatenate([self._w.s, sw], axis=0)
            self._w.keys = jnp.concatenate([self._w.keys, key], axis=0)
            self._w.R += 1
            self._w.p = wl.make_params(
                np.full(self._w.R, self._w.beta), self.transverse, self.longitudinal, self._w.L
            )
        elif self._keys is None:
            self._keys, self._init_states = key, s0
        else:
            self._keys = jnp.concatenate([self._keys, key], axis=0)
            self._init_states = jnp.concatenate([self._init_states, s0], axis=0)

    def set_enable_heatbath(self, enable: bool) -> None:
        """qmcising.rs:124-129 — applied to all graphs."""
        self.enable_heatbath = bool(enable)
        if self._w is not None:
            self._w.enable_heatbath = self.enable_heatbath

    def set_enable_rvb(self, enable: bool) -> None:
        """qmcising.rs:131-136."""
        self.enable_rvb = bool(enable)
        if self._w is not None:
            self._w.enable_rvb = self.enable_rvb

    def _ensure(self, beta: Optional[float]) -> wl.WorldlineEnsemble:
        """Materialize / regrid the worldline ensemble for the given beta.
        beta=None keeps the current grid (default beta=1.0 if first use)."""
        if self._w is None:
            b = 1.0 if beta is None else float(beta)
            R = self.num_graphs
            self._w = wl.WorldlineEnsemble(
                cg=self.cg,
                transverse=self.transverse,
                longitudinal=self.longitudinal,
                beta=b,
                keys=self._keys,
                num_experiments=R,
                enable_rvb=self.enable_rvb,
                enable_heatbath=self.enable_heatbath,
                states=jnp.broadcast_to(
                    self._init_states[:, :, None],
                    (R, self.nvars, wl.choose_ltau(b, self.transverse, self.dtau)),
                ),
                ltau=wl.choose_ltau(b, self.transverse, self.dtau),
            )
            self._keys = self._init_states = None
        elif beta is not None and float(beta) != self._w.beta:
            b = float(beta)
            Lnew = wl.choose_ltau(b, self.transverse, self.dtau)
            s = self._w.s
            if Lnew != self._w.L:
                idx = (np.arange(Lnew) * self._w.L // Lnew).astype(np.int32)
                s = jnp.take(s, jnp.asarray(idx), axis=2)
            self._w = wl.WorldlineEnsemble(
                cg=self.cg,
                transverse=self.transverse,
                longitudinal=self.longitudinal,
                beta=b,
                keys=self._w.keys,
                num_experiments=self._w.R,
                enable_rvb=self.enable_rvb,
                enable_heatbath=self.enable_heatbath,
                states=s,
                ltau=Lnew,
            )
        else:
            self._w.enable_rvb = self.enable_rvb
            self._w.enable_heatbath = self.enable_heatbath
        return self._w

    # ------------------------------------------------------------------- runs

    def run_qmc(self, beta: float, timesteps: int) -> None:
        """qmcising.rs:139-143 — full sweeps over all graphs, no return.
        Runs on an empty container are no-ops (reference iterates an empty
        Vec)."""
        if self.num_graphs == 0:
            return
        self._ensure(beta).timesteps(int(timesteps))

    def run_diagonal(self, beta: float, timesteps: Optional[int] = None) -> None:
        """qmcising.rs:146-151 — single-site-update-only sweeps."""
        if self.num_graphs == 0:
            return
        self._ensure(beta).diagonal_sweeps(int(timesteps or 1))

    def run_cluster(self) -> np.ndarray:
        """qmcising.rs:154-165 — one cluster update each -> cluster_sizes[n]."""
        if self.num_graphs == 0:
            return np.zeros(0, np.int64)
        return self._ensure(None).cluster_step()

    def run_rvb(self, timesteps: Optional[int] = None, updates_per_sweep: Optional[int] = None):
        """qmcising.rs:168-190 -> success_ratio[n, timesteps] f64."""
        if self.num_graphs == 0:
            return np.zeros((0, int(timesteps or 1)), np.float64)
        return self._ensure(None).rvb_sweeps(int(timesteps or 1), updates_per_sweep)

    def run_sampling(
        self,
        beta: float,
        timesteps: int,
        sampling_wait_buffer: Optional[int] = None,
        sampling_freq: Optional[int] = None,
    ):
        """qmcising.rs:200-240 -> (energies[n], states[n, t/freq, nvars])."""
        wait = min(int(sampling_wait_buffer or 0), int(timesteps))
        freq = int(sampling_freq) if sampling_freq else 1
        if self.num_graphs == 0:
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
        """qmcising.rs:250-287 -> bond_counts[n, t/freq, nbonds] int (SSE
        diagonal-op count per bond; worldline estimator, see
        engines/worldline.bond_op_counts)."""
        wait = min(int(sampling_wait_buffer or 0), int(timesteps))
        freq = int(sampling_freq) if sampling_freq else 1
        if self.num_graphs == 0:
            return np.zeros((0, int(timesteps) // freq, self.cg.nedges), np.int64)
        w = self._ensure(beta)
        if wait:
            w.timesteps(wait)
        _, counts = w.bond_sample(int(timesteps), freq)
        return counts

    # ---------------------------------------------------------- correlations

    def _autocorr_run(self, beta, timesteps, wait):
        w = self._ensure(beta)
        if wait:
            w.timesteps(int(wait))
        return w

    def run_quantum_monte_carlo_and_measure_variable_autocorrelation(
        self,
        beta: float,
        timesteps: int,
        sampling_wait_buffer: Optional[int] = None,
        sampling_freq: Optional[int] = None,
    ):
        """qmcising.rs:297-323 -> corrs[n, timesteps]: the t/freq-length
        autocorrelation of the freq-sampled series in the leading columns of a
        zero-filled [n, timesteps] array (SURVEY.md 2.4 quirk 2)."""
        freq = int(sampling_freq) if sampling_freq else 1
        if self.num_graphs == 0:
            return np.zeros((0, int(timesteps)), np.float64)
        w = self._autocorr_run(beta, timesteps, sampling_wait_buffer)
        return pad_autocorr(
            w.variable_autocorrelation(int(timesteps), freq), int(timesteps)
        )

    def run_quantum_monte_carlo_and_measure_spin_product_autocorrelation(
        self,
        beta: float,
        timesteps: int,
        spin_products: Sequence[Sequence[int]],
        sampling_wait_buffer: Optional[int] = None,
        sampling_freq: Optional[int] = None,
    ):
        """qmcising.rs:334-369 -> corrs[n, timesteps]."""
        for sub in spin_products:
            for v in sub:
                if int(v) < 0 or int(v) >= self.nvars:
                    raise ValueError(f"Spin product variable {v} out of bounds")
        freq = int(sampling_freq) if sampling_freq else 1
        if self.num_graphs == 0:
            return np.zeros((0, int(timesteps)), np.float64)
        w = self._autocorr_run(beta, timesteps, sampling_wait_buffer)
        return pad_autocorr(
            w.spin_product_autocorrelation(int(timesteps), freq, spin_products),
            int(timesteps),
        )

    def run_quantum_monte_carlo_and_measure_bond_autocorrelation(
        self,
        beta: float,
        timesteps: int,
        sampling_wait_buffer: Optional[int] = None,
        sampling_freq: Optional[int] = None,
    ):
        """qmcising.rs:379-404 -> corrs[n, timesteps]."""
        freq = int(sampling_freq) if sampling_freq else 1
        if self.num_graphs == 0:
            return np.zeros((0, int(timesteps)), np.float64)
        w = self._autocorr_run(beta, timesteps, sampling_wait_buffer)
        return pad_autocorr(
            w.bond_autocorrelation(int(timesteps), freq), int(timesteps)
        )

    # ------------------------------------------------------------ inspection

    def get_offset(self) -> float:
        """qmcising.rs:407-413 — 0.0 with no graphs, else the constant energy
        offset (convention documented in engines/worldline.py)."""
        if self.num_graphs == 0:
            return 0.0
        return float(
            np.abs(self.cg.edge_j).sum()
            + self.nvars * abs(self.longitudinal)
            + self.nvars * self.transverse
        )

    def get_graph_itime(self, g: int) -> np.ndarray:
        """qmcising.rs:416-440 -> bool[L_tau, nvars]: the spin configuration at
        every imaginary-time slice (worldline tau axis = SSE cutoff axis)."""
        g = int(g)
        if g < 0 or g >= self.num_graphs:
            raise ValueError(f"Graph index {g} out of bounds")
        return self._ensure(None).itime_states(g)

    def clone(self) -> "QmcIsing":
        """qmcising.rs:443-445."""
        other = QmcIsing.__new__(QmcIsing)
        other.__dict__.update(self.__dict__)
        other.rng = self.rng.clone()
        if self._w is not None:
            w = self._w
            other._w = wl.WorldlineEnsemble(
                cg=self.cg,
                transverse=self.transverse,
                longitudinal=self.longitudinal,
                beta=w.beta,
                keys=w.keys,
                num_experiments=w.R,
                enable_rvb=w.enable_rvb,
                enable_heatbath=w.enable_heatbath,
                states=w.s,
                ltau=w.L,
            )
        return other

    # ----------------------------------------------------------- persistence

    def save_to_file(self, path: str) -> None:
        """qmcising.rs:448-466 — CBOR FileType tuple (qmcising.rs:22-32); the
        per-graph payload is the full worldline state. RNG is NOT saved."""
        graphs = []
        if self._w is not None:
            s = np.asarray(self._w.s)
            for g in range(self._w.R):
                graphs.append(
                    {"L": self._w.L, "beta": self._w.beta, "worldline": (s[g] == 1)}
                )
        elif self._keys is not None:
            s = np.asarray(self._init_states)
            for g in range(s.shape[0]):
                graphs.append({"L": 0, "beta": 0.0, "worldline": (s[g] == 1)[:, None]})
        cbor.dump(
            [
                self.nvars,
                [[list(ab), j] for ab, j in self.edges],
                self.transverse,
                self.longitudinal,
                self.enable_heatbath,
                self.enable_rvb,
                None if self.seed is None else int(self.seed),
                self.use_allocator,
                graphs,
            ],
            path,
        )

    @staticmethod
    def read_from_file(path: str, reseed: Optional[int] = None) -> "QmcIsing":
        """qmcising.rs:470-512 — reload; RNG is regenerated from ``reseed`` (or
        entropy), never restored (qmcising.rs:485-486 semantics)."""
        data = cbor.load(path)
        (nvars, edges, transverse, longitudinal, heatbath, rvb, seed, use_alloc, graphs) = data
        edges = [((int(a), int(b)), float(j)) for (a, b), j in edges]
        out = QmcIsing(
            edges,
            transverse,
            longitudinal,
            num_experiments=0,
            seed=reseed,
            use_allocator=use_alloc,
            do_heatbath_updates=heatbath,
            do_rvb_updates=rvb,
        )
        if graphs:
            R = len(graphs)
            keys = keys_from_seeds(out.rng.make_seeds(R))
            L = int(graphs[0]["L"])
            if L == 0:  # saved before materialization
                out._keys = keys
                out._init_states = jnp.asarray(
                    np.stack(
                        [np.where(g["worldline"][:, 0], 1, -1).astype(np.int8) for g in graphs]
                    )
                )
            else:
                beta = float(graphs[0]["beta"])
                s = jnp.asarray(
                    np.stack([np.where(g["worldline"], 1, -1).astype(np.int8) for g in graphs])
                )
                out._w = wl.WorldlineEnsemble(
                    cg=out.cg,
                    transverse=out.transverse,
                    longitudinal=out.longitudinal,
                    beta=beta,
                    keys=keys,
                    num_experiments=R,
                    enable_rvb=out.enable_rvb,
                    enable_heatbath=out.enable_heatbath,
                    states=s,
                    ltau=L,
                )
        return out
