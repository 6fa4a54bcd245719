"""``Lattice`` — the stateless launcher class.

Parity target: /root/reference/src/lattice.rs:27-1041 (see SURVEY.md section
2.2 for the full method table). ``Lattice`` holds a problem definition (edge
list, biases, transverse field, initial state, update flags, seed generator);
every ``run_*`` call builds fresh per-experiment simulators, runs them to
completion, and returns numpy arrays. No simulator state survives between calls
(lattice.rs:24-26).

TPU-native realization: experiments are a vmapped replica batch on one chip
(not one-per-thread); sweeps are conflict-free colored updates; the quantum
methods run the Trotterized worldline engine instead of SSE (SURVEY.md
section 7 design stance).
"""

from __future__ import annotations

import copy
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .engines import classical as ce
from .graph import compile_graph, detect_square_torus
from .ops import lattice2d as l2d
from .rng import MasterRng, keys_from_seeds

__all__ = ["Lattice"]



class Lattice:
    """Stateless Monte Carlo launcher over an arbitrary edge-list Ising graph.

    Constructor parity: ``Lattice(edges, seed_gen?, use_allocator?)``
    (lattice.rs:45-74). ``use_allocator`` toggled the reference's object-pool
    allocator for SSE op nodes (SURVEY.md section 2.3); on TPU storage is
    preallocated dense arrays, so the flag is accepted and ignored.
    """

    def __init__(
        self,
        edges: Sequence,
        seed_gen: Optional[int] = None,
        use_allocator: bool = True,
        *,
        dtau: Optional[float] = None,
    ):
        self.edges = [((int(a), int(b)), float(j)) for (a, b), j in edges]
        self.cg = compile_graph(self.edges)
        self.nvars = self.cg.nvars
        self.rng = MasterRng(seed_gen)
        self.use_allocator = bool(use_allocator)
        # Framework extension (no reference analogue): Trotter-step target for
        # the quantum methods. The reference's SSE has zero Trotter bias by
        # construction (qmcising.rs:37-143); the worldline formulation's bias
        # is O(dtau^2) and this knob (or PMC_DTAU) controls it — see
        # docs/DESIGN.md "Trotter error control".
        self.dtau = dtau
        # bias: ("global", x) or ("individual", np.ndarray) — BiasType enum
        # parity (lattice.rs:18-22)
        self.bias = ("global", 0.0)
        self.transverse: Optional[float] = None
        self.initial_state: Optional[np.ndarray] = None
        self.enable_rvb = False
        self.enable_heatbath = False
        self.enable_cluster = False
        self._ga = None  # lazily-built device graph
        # uniform-J periodic square lattices dispatch to the fused 2D fast
        # path (ops/lattice2d.py); (L, J) or None
        self._torus = detect_square_torus(self.cg)

    # ------------------------------------------------------------------ config

    def set_seed_gen(self, seed_gen: Optional[int] = None) -> None:
        """lattice.rs:78-80."""
        self.rng.reset(seed_gen)

    def make_seeds(self, num_experiments: int):
        """lattice.rs:83-91 — one u64 per experiment, advancing the master."""
        return [int(x) for x in self.rng.make_seeds(num_experiments)]

    def set_enable_rvb_update(self, enable: bool) -> None:
        """lattice.rs:94-96."""
        self.enable_rvb = bool(enable)

    def set_enable_heatbath_update(self, enable: bool) -> None:
        """lattice.rs:99-101."""
        self.enable_heatbath = bool(enable)

    def set_enable_cluster_updates(self, enable: bool) -> None:
        """Framework extension (no reference analogue): include one
        Swendsen-Wang cluster update per classical time step
        (engines/classical.py:sw_cluster_update). Large-move family for
        low-temperature / quench workloads where single-flip dynamics coarsen
        slowly; samples the identical Gibbs distribution. Off by default."""
        self.enable_cluster = bool(enable)

    def set_individual_bias(self, var: int, bias: float) -> None:
        """lattice.rs:104-126 — promotes Global->Individual vector; OOB ValueError."""
        var = int(var)
        if var < 0 or var >= self.nvars:
            raise ValueError(f"Variable {var} out of bounds (nvars={self.nvars})")
        if self.bias[0] == "global":
            vec = np.full(self.nvars, float(self.bias[1]), dtype=np.float64)
        else:
            vec = np.array(self.bias[1], dtype=np.float64, copy=True)
        vec[var] = float(bias)
        self.bias = ("individual", vec)

    def set_global_bias(self, bias: float) -> None:
        """lattice.rs:129-131."""
        self.bias = ("global", float(bias))

    def set_transverse_field(self, gamma: float) -> None:
        """lattice.rs:134-146 — gamma>0 sets, gamma==0 clears, gamma<0 ValueError."""
        gamma = float(gamma)
        if gamma > 0:
            self.transverse = gamma
        elif gamma == 0:
            self.transverse = None
        else:
            raise ValueError("Transverse field must be non-negative")

    def set_initial_state(self, state: Sequence[bool]) -> None:
        """lattice.rs:149-161 — len must be nvars or 0 (0 clears)."""
        state = list(state)
        if len(state) == 0:
            self.initial_state = None
        elif len(state) == self.nvars:
            self.initial_state = np.array(state, dtype=bool)
        else:
            raise ValueError(
                f"Initial state must have length 0 or {self.nvars}, got {len(state)}"
            )

    def clone(self) -> "Lattice":
        """lattice.rs:1038-1040."""
        other = Lattice.__new__(Lattice)
        other.edges = list(self.edges)
        other.cg = self.cg
        other.nvars = self.nvars
        other.rng = self.rng.clone()
        other.use_allocator = self.use_allocator
        other.bias = copy.deepcopy(self.bias)
        other.transverse = self.transverse
        other.initial_state = (
            None if self.initial_state is None else self.initial_state.copy()
        )
        other.enable_rvb = self.enable_rvb
        other.enable_heatbath = self.enable_heatbath
        other.enable_cluster = self.enable_cluster
        other.dtau = self.dtau
        other._ga = self._ga
        other._torus = self._torus
        return other

    # ------------------------------------------------------------- internals

    def _graph_arrays(self):
        if self._ga is None:
            self._ga = ce.device_graph_sorted(self.cg)
        return self._ga

    def _bias_vector(self) -> np.ndarray:
        if self.bias[0] == "global":
            return np.full(self.nvars, float(self.bias[1]), dtype=np.float64)
        return np.asarray(self.bias[1], dtype=np.float64)

    def _classical_setup(self, num_experiments: int):
        """Fresh per-experiment keys + initial spin states (lattice.rs:191-203)."""
        seeds = self.rng.make_seeds(num_experiments)
        keys = keys_from_seeds(seeds)
        if self.initial_state is not None:
            s0 = jnp.broadcast_to(
                jnp.asarray(
                    np.where(self.initial_state, 1, -1).astype(np.int8)
                )[None, :],
                (num_experiments, self.nvars),
            )
        else:
            s0 = ce.random_states(keys, self.nvars)
        return s0, keys

    def _fast2d(self) -> bool:
        """Dispatch classical runs to the fused 2D torus path when the graph is
        a uniform-J periodic square lattice and the bias is global. The fast
        path runs checkerboard single-spin sweeps (the extra edge/worm families
        are redundant for ergodicity on an unfrustrated uniform torus; the
        sampled equilibrium distribution is identical). Cluster updates
        (set_enable_cluster_updates) route to the generic engine, which has
        the Swendsen-Wang family."""
        return (
            self._torus is not None
            and self.bias[0] == "global"
            and not self.enable_heatbath
            and not self.enable_cluster
        )

    def _classical_setup_2d(self, num_experiments: int):
        L = self._torus[0]
        seeds = self.rng.make_seeds(num_experiments)
        keys = keys_from_seeds(seeds)
        if self.initial_state is not None:
            s0 = jnp.broadcast_to(
                jnp.asarray(np.where(self.initial_state, 1, -1).astype(np.int8)).reshape(L, L)[
                    None
                ],
                (num_experiments, L, L),
            )
        else:
            s0 = l2d.random_states_2d(keys, L)
        return s0, keys

    def _check_classical(self):
        """lattice.rs:216-220 — classical runs reject a set transverse field."""
        if self.transverse is not None:
            raise ValueError(
                "Cannot run classic monte carlo with transverse field set"
            )

    def _move_args(self, only_basic_moves, importance=None):
        only_basic = bool(only_basic_moves) if only_basic_moves is not None else False
        return dict(
            nspin_sweeps=1,
            nedge_sweeps=0 if only_basic else 1,
            nworms=0 if only_basic else 1,
            only_basic=only_basic,
            heatbath=self.enable_heatbath,
            wlen=min(self.nvars, ce.DEFAULT_WLEN),
            nclusters=1 if (self.enable_cluster and not only_basic) else 0,
            # importance-sampled edge-move attempts (lattice.rs:200): attempt
            # probability follows |J_e| (see engines/classical.importance_weights)
            iw=ce.importance_weights(self.cg) if (importance and not only_basic) else None,
        )

    def _anneal_schedule(self, betas, timesteps: int) -> np.ndarray:
        """Documented piecewise-linear beta(t) (lattice.rs:304). The reference
        implementation has a shadowing bug making beta constant (SURVEY.md
        section 2.4 quirk 1, lattice.rs:331-366); we implement the documented
        intent: schedule sorted, padded to t=0 and t=T, linear in between;
        empty schedule -> constant beta=1.0 (lattice.rs:321-324)."""
        pts = sorted((int(t), float(b)) for t, b in betas)
        if not pts:
            return np.full(timesteps, 1.0)
        ts = np.array([p[0] for p in pts], dtype=np.float64)
        bs = np.array([p[1] for p in pts], dtype=np.float64)
        return np.interp(np.arange(timesteps, dtype=np.float64), ts, bs)

    # -------------------------------------------------------- classical runs

    def run_monte_carlo(
        self,
        beta: float,
        timesteps: int,
        num_experiments: int,
        only_basic_moves: Optional[bool] = None,
        edge_move_importance_sampling: Optional[bool] = None,
    ):
        """lattice.rs:171-221 -> (energies[n] f64, states[n, nvars] bool).

        ``edge_move_importance_sampling`` (lattice.rs:200) biases edge-move
        attempt frequency by coupling magnitude (exact: the proposal is
        state-independent, see engines/classical._edge_color_update). On
        uniform-J graphs — including the fused-torus fast path — all weights
        are 1 and the flag is a no-op by construction.
        """
        self._check_classical()
        beta_arr = jnp.full(int(timesteps), float(beta), jnp.float32)
        if self._fast2d():
            _, J = self._torus
            h = float(self.bias[1])
            s0, keys = self._classical_setup_2d(num_experiments)
            s, _ = l2d.run_steps_2d(s0, keys, beta_arr, J, h)
            es = l2d.energy_2d(s, J, h)
            return np.asarray(es, np.float64), np.asarray(
                s.reshape(num_experiments, self.nvars) == 1
            )
        ga = self._graph_arrays()
        bias = jnp.asarray(self._bias_vector(), jnp.float32)
        s0, keys = self._classical_setup(num_experiments)
        s, _ = ce.run_steps_chunked(
            ga, bias, s0, keys, beta_arr,
            **self._move_args(only_basic_moves, edge_move_importance_sampling),
        )
        es = ce.energy(ga, bias, s)
        return np.asarray(es, np.float64), np.asarray(s == 1)

    def run_monte_carlo_sampling(
        self,
        beta: float,
        timesteps: int,
        num_experiments: int,
        only_basic_moves: Optional[bool] = None,
        thermalization_time: Optional[int] = None,
        sampling_freq: Optional[int] = None,
        edge_move_importance_sampling: Optional[bool] = None,
    ):
        """lattice.rs:231-299 -> (energies[n, t/freq], states[n, t/freq, nvars])."""
        self._check_classical()
        if self._fast2d():
            _, J = self._torus
            h = float(self.bias[1])
            s0, keys = self._classical_setup_2d(num_experiments)
            therm = int(thermalization_time or 0)
            freq = int(sampling_freq) if sampling_freq else 1
            if therm:
                beta_arr = jnp.full(therm, float(beta), jnp.float32)
                s0, keys = l2d.run_steps_2d(s0, keys, beta_arr, J, h)
            _, _, es, ss = l2d.run_sampling_2d(
                s0, keys, float(beta), float(J), float(h), int(timesteps), freq
            )
            nsamp = ss.shape[1]
            return np.asarray(es, np.float64), np.asarray(
                ss.reshape(num_experiments, nsamp, self.nvars) == 1
            )
        ga = self._graph_arrays()
        bias = jnp.asarray(self._bias_vector(), jnp.float32)
        s0, keys = self._classical_setup(num_experiments)
        margs = self._move_args(only_basic_moves, edge_move_importance_sampling)
        therm = int(thermalization_time or 0)
        freq = int(sampling_freq) if sampling_freq else 1
        if therm:
            beta_arr = jnp.full(therm, float(beta), jnp.float32)
            s0, keys = ce.run_steps_chunked(ga, bias, s0, keys, beta_arr, **margs)
        _, _, es, ss = ce.run_sampling(
            ga, bias, s0, keys, jnp.float32(beta), int(timesteps), freq, **margs
        )
        return np.asarray(es, np.float64), np.asarray(ss == 1)

    def run_monte_carlo_annealing(
        self,
        betas: Sequence,
        timesteps: int,
        num_experiments: int,
        only_basic_moves: Optional[bool] = None,
        edge_move_importance_sampling: Optional[bool] = None,
    ):
        """lattice.rs:309-385 -> (energies[n], states[n, nvars])."""
        self._check_classical()
        beta_arr = jnp.asarray(self._anneal_schedule(betas, int(timesteps)), jnp.float32)
        if self._fast2d():
            _, J = self._torus
            h = float(self.bias[1])
            s0, keys = self._classical_setup_2d(num_experiments)
            s, _ = l2d.run_steps_2d(s0, keys, beta_arr, J, h)
            es = l2d.energy_2d(s, J, h)
            return np.asarray(es, np.float64), np.asarray(
                s.reshape(num_experiments, self.nvars) == 1
            )
        ga = self._graph_arrays()
        bias = jnp.asarray(self._bias_vector(), jnp.float32)
        s0, keys = self._classical_setup(num_experiments)
        s, _ = ce.run_steps_chunked(
            ga, bias, s0, keys, beta_arr,
            **self._move_args(only_basic_moves, edge_move_importance_sampling),
        )
        es = ce.energy(ga, bias, s)
        return np.asarray(es, np.float64), np.asarray(s == 1)

    def run_monte_carlo_annealing_and_get_energies(
        self,
        betas: Sequence,
        timesteps: int,
        num_experiments: int,
        only_basic_moves: Optional[bool] = None,
        edge_move_importance_sampling: Optional[bool] = None,
    ):
        """lattice.rs:395-470 -> (energies[n, timesteps], states[n, nvars])."""
        self._check_classical()
        if self._fast2d():
            _, J = self._torus
            h = float(self.bias[1])
            s0, keys = self._classical_setup_2d(num_experiments)
            beta_arr = jnp.asarray(self._anneal_schedule(betas, int(timesteps)), jnp.float32)
            s, _, es = l2d.run_steps_2d(s0, keys, beta_arr, J, h, collect_energies=True)
            return np.asarray(es, np.float64), np.asarray(
                s.reshape(num_experiments, self.nvars) == 1
            )
        ga = self._graph_arrays()
        bias = jnp.asarray(self._bias_vector(), jnp.float32)
        s0, keys = self._classical_setup(num_experiments)
        beta_arr = jnp.asarray(self._anneal_schedule(betas, int(timesteps)), jnp.float32)
        s, _, es = ce.run_steps_chunked(
            ga, bias, s0, keys, beta_arr, collect_energies=True,
            **self._move_args(only_basic_moves, edge_move_importance_sampling),
        )
        return np.asarray(es, np.float64), np.asarray(s == 1)

    # ---------------------------------------------------------- quantum runs

    def _check_quantum(self):
        """lattice.rs:485-492 — QMC needs a global (not individual) bias and a
        transverse field."""
        if self.bias[0] != "global":
            raise ValueError("Cannot run quantum monte carlo with individual biases")
        if self.transverse is None:
            raise ValueError("Cannot run quantum monte carlo without transverse field")

    def _worldline(self, num_experiments: int, beta: float):
        self._check_quantum()
        from .engines import worldline as wl
        seeds = self.rng.make_seeds(num_experiments)
        keys = keys_from_seeds(seeds)
        init = None
        if self.initial_state is not None:
            init = np.where(self.initial_state, 1, -1).astype(np.int8)
        return wl.WorldlineEnsemble(
            cg=self.cg,
            transverse=float(self.transverse),
            longitudinal=float(self.bias[1]),
            beta=float(beta),
            keys=keys,
            num_experiments=num_experiments,
            initial_state=init,
            enable_rvb=self.enable_rvb,
            enable_heatbath=self.enable_heatbath,
            dtau=self.dtau,
        )

    def run_quantum_monte_carlo(self, beta: float, timesteps: int, num_experiments: int):
        """lattice.rs:478-535 -> (avg_energies[n], states[n, nvars] bool)."""
        w = self._worldline(num_experiments, beta)
        es = w.timesteps(int(timesteps))
        return np.asarray(es, np.float64), w.states_bool()

    def run_quantum_monte_carlo_sampling(
        self,
        beta: float,
        timesteps: int,
        num_experiments: int,
        sampling_wait_buffer: Optional[int] = None,
        sampling_freq: Optional[int] = None,
    ):
        """lattice.rs:546-617 -> (avg_energies[n], states[n, t/freq, nvars])."""
        w = self._worldline(num_experiments, beta)
        wait = min(int(sampling_wait_buffer or 0), int(timesteps))  # clamp, lattice.rs:564-565
        freq = int(sampling_freq) if sampling_freq else 1
        if wait:
            w.timesteps(wait)
        es, ss = w.timesteps_sample(int(timesteps), freq)
        return np.asarray(es, np.float64), np.asarray(ss)

    def run_quantum_monte_carlo_and_measure_variable_autocorrelation(
        self,
        beta: float,
        timesteps: int,
        num_experiments: int,
        sampling_wait_buffer: Optional[int] = None,
        sampling_freq: Optional[int] = None,
    ):
        """lattice.rs:628-691 -> corrs[n, t/freq]."""
        w = self._worldline(num_experiments, beta)
        if sampling_wait_buffer:
            w.timesteps(int(sampling_wait_buffer))  # not clamped (SURVEY 2.4.6)
        freq = int(sampling_freq) if sampling_freq else 1
        return np.asarray(
            w.variable_autocorrelation(int(timesteps), freq), np.float64
        )

    def run_quantum_monte_carlo_and_measure_spin_product_autocorrelation(
        self,
        beta: float,
        timesteps: int,
        num_experiments: int,
        spin_products: Sequence[Sequence[int]],
        sampling_wait_buffer: Optional[int] = None,
        sampling_freq: Optional[int] = None,
    ):
        """lattice.rs:703-772 -> corrs[n, t/freq]."""
        w = self._worldline(num_experiments, beta)
        if sampling_wait_buffer:
            w.timesteps(int(sampling_wait_buffer))
        freq = int(sampling_freq) if sampling_freq else 1
        return np.asarray(
            w.spin_product_autocorrelation(int(timesteps), freq, spin_products),
            np.float64,
        )

    def run_quantum_monte_carlo_and_measure_bond_autocorrelation(
        self,
        beta: float,
        timesteps: int,
        num_experiments: int,
        sampling_wait_buffer: Optional[int] = None,
        sampling_freq: Optional[int] = None,
    ):
        """lattice.rs:783-846 -> corrs[n, t/freq]."""
        w = self._worldline(num_experiments, beta)
        if sampling_wait_buffer:
            w.timesteps(int(sampling_wait_buffer))
        freq = int(sampling_freq) if sampling_freq else 1
        return np.asarray(w.bond_autocorrelation(int(timesteps), freq), np.float64)

    def run_quantum_monte_carlo_and_measure_spins(
        self,
        beta: float,
        timesteps: int,
        num_experiments: int,
        sampling_freq: Optional[int] = None,
        sampling_wait_buffer: Optional[int] = None,
        spin_measurement=None,
        exponent: Optional[int] = None,
    ):
        """lattice.rs:857-934 -> (measures[n], energies[n]). Per sample computes
        ``(sum_i m(s_i)) ** exponent`` with m mapping down/up to
        ``spin_measurement`` (default (-1.0, 1.0), lattice.rs:878,914), then
        time-averages."""
        w = self._worldline(num_experiments, beta)
        wait = min(int(sampling_wait_buffer or 0), int(timesteps))
        freq = int(sampling_freq) if sampling_freq else 1
        if wait:
            w.timesteps(wait)
        down, up = spin_measurement if spin_measurement is not None else (-1.0, 1.0)
        exp_ = int(exponent) if exponent is not None else 1
        meas, es = w.measure_spins(int(timesteps), freq, float(down), float(up), exp_)
        return np.asarray(meas, np.float64), np.asarray(es, np.float64)

    def get_offset(self) -> float:
        """lattice.rs:937-959 — the constant energy offset such that
        E = offset - <n_ops>/beta in the SSE representation. Our convention
        (Sandvik-style, documented in engines/worldline.py): sum_b |J_b| +
        sum_i |h_i| + nvars * Gamma."""
        self._check_quantum()
        h = abs(float(self.bias[1]))
        return float(
            np.abs(self.cg.edge_j).sum() + self.nvars * h + self.nvars * float(self.transverse)
        )

    def average_on_and_off_diagonal_and_consts(
        self,
        beta: float,
        timesteps: int,
        num_experiments: int,
        sampling_freq: Optional[int] = None,
        sampling_wait_buffer: Optional[int] = None,
    ):
        """lattice.rs:967-1035 -> (diag, offdiag, consts) mean SSE operator
        counts, reinterpreted for worldlines (see engines/worldline.py:
        op_count_estimates)."""
        w = self._worldline(num_experiments, beta)
        wait = int(sampling_wait_buffer or 0)
        freq = int(sampling_freq) if sampling_freq else 1
        if wait:
            w.timesteps(wait)
        d, o, c = w.op_count_estimates(int(timesteps), freq)
        return float(d), float(o), float(c)
