"""Complete API-surface parity check (SURVEY.md section 2.2): every public
method of the reference's five classes must exist with the documented
parameters, in the documented order."""

import inspect

import pytest

from pyisingmontecarlo_tpu import (
    ClassicIsing,
    Lattice,
    LatticeTempering,
    QmcIsing,
    QmcRunner,
)

# (method, required params in order, optional params in order)
LATTICE = [
    ("__init__", ["edges"], ["seed_gen", "use_allocator"]),
    ("set_seed_gen", [], ["seed_gen"]),
    ("make_seeds", ["num_experiments"], []),
    ("set_enable_rvb_update", ["enable"], []),
    ("set_enable_heatbath_update", ["enable"], []),
    ("set_individual_bias", ["var", "bias"], []),
    ("set_global_bias", ["bias"], []),
    ("set_transverse_field", ["gamma"], []),
    ("set_initial_state", ["state"], []),
    ("run_monte_carlo", ["beta", "timesteps", "num_experiments"],
     ["only_basic_moves", "edge_move_importance_sampling"]),
    ("run_monte_carlo_sampling", ["beta", "timesteps", "num_experiments"],
     ["only_basic_moves", "thermalization_time", "sampling_freq",
      "edge_move_importance_sampling"]),
    ("run_monte_carlo_annealing", ["betas", "timesteps", "num_experiments"],
     ["only_basic_moves", "edge_move_importance_sampling"]),
    ("run_monte_carlo_annealing_and_get_energies",
     ["betas", "timesteps", "num_experiments"],
     ["only_basic_moves", "edge_move_importance_sampling"]),
    ("run_quantum_monte_carlo", ["beta", "timesteps", "num_experiments"], []),
    ("run_quantum_monte_carlo_sampling", ["beta", "timesteps", "num_experiments"],
     ["sampling_wait_buffer", "sampling_freq"]),
    ("run_quantum_monte_carlo_and_measure_variable_autocorrelation",
     ["beta", "timesteps", "num_experiments"],
     ["sampling_wait_buffer", "sampling_freq"]),
    ("run_quantum_monte_carlo_and_measure_spin_product_autocorrelation",
     ["beta", "timesteps", "num_experiments", "spin_products"],
     ["sampling_wait_buffer", "sampling_freq"]),
    ("run_quantum_monte_carlo_and_measure_bond_autocorrelation",
     ["beta", "timesteps", "num_experiments"],
     ["sampling_wait_buffer", "sampling_freq"]),
    ("run_quantum_monte_carlo_and_measure_spins",
     ["beta", "timesteps", "num_experiments"],
     ["sampling_freq", "sampling_wait_buffer", "spin_measurement", "exponent"]),
    ("get_offset", [], []),
    ("average_on_and_off_diagonal_and_consts",
     ["beta", "timesteps", "num_experiments"],
     ["sampling_freq", "sampling_wait_buffer"]),
    ("clone", [], []),
]

CLASSIC = [
    ("__init__", ["edges"],
     ["longitudinal", "num_experiments", "seed", "use_basic_moves"]),
    ("add_graph", [], ["initial_state", "edge_move_importance_sampling"]),
    ("run_monte_carlo", ["beta", "timesteps"],
     ["nspinupdates", "nedgeupdates", "nwormupdates", "only_basic_moves"]),
    ("run_monte_carlo_sampling", ["beta", "timesteps"],
     ["nspinupdates", "nedgeupdates", "nwormupdates", "only_basic_moves",
      "thermalization_time", "sampling_freq"]),
]

QMCISING = [
    ("__init__", ["edges", "transverse"],
     ["longitudinal", "num_experiments", "seed", "use_allocator",
      "do_heatbath_updates", "do_rvb_updates"]),
    ("add_qmc", [], ["use_allocator"]),
    ("set_enable_heatbath", ["enable"], []),
    ("set_enable_rvb", ["enable"], []),
    ("run_qmc", ["beta", "timesteps"], []),
    ("run_diagonal", ["beta"], ["timesteps"]),
    ("run_cluster", [], []),
    ("run_rvb", [], ["timesteps", "updates_per_sweep"]),
    ("run_sampling", ["beta", "timesteps"],
     ["sampling_wait_buffer", "sampling_freq"]),
    ("run_bond_sampling", ["beta", "timesteps"],
     ["sampling_wait_buffer", "sampling_freq"]),
    ("run_quantum_monte_carlo_and_measure_variable_autocorrelation",
     ["beta", "timesteps"], ["sampling_wait_buffer", "sampling_freq"]),
    ("run_quantum_monte_carlo_and_measure_spin_product_autocorrelation",
     ["beta", "timesteps", "spin_products"],
     ["sampling_wait_buffer", "sampling_freq"]),
    ("run_quantum_monte_carlo_and_measure_bond_autocorrelation",
     ["beta", "timesteps"], ["sampling_wait_buffer", "sampling_freq"]),
    ("get_offset", [], []),
    ("get_graph_itime", ["g"], []),
    ("clone", [], []),
    ("save_to_file", ["path"], []),
    ("read_from_file", ["path"], ["reseed"]),
]

QMCRUNNER = [
    ("__init__", ["nvars", "num_experiments"],
     ["seed", "use_allocator", "do_loop_updates", "do_heatbath_updates"]),
    ("add_qmc", [], ["use_allocator"]),
    ("add_interaction", ["mat", "vars"], []),
    ("add_interaction_and_offset", ["mat", "vars"], []),
    ("add_diagonal_interaction", ["mat", "vars"], []),
    ("add_diagonal_interaction_and_offset", ["mat", "vars"], []),
    ("set_do_heatbath", ["enable"], []),
    ("set_do_loop_updates", ["enable"], []),
    ("run_sampling", ["beta", "timesteps"],
     ["sampling_wait_buffer", "sampling_freq"]),
    ("run_bond_sampling", ["beta", "timesteps"],
     ["sampling_wait_buffer", "sampling_freq"]),
    ("run_quantum_monte_carlo_and_measure_variable_autocorrelation",
     ["beta", "timesteps"], ["sampling_wait_buffer", "sampling_freq"]),
    ("run_quantum_monte_carlo_and_measure_spin_product_autocorrelation",
     ["beta", "timesteps", "spin_products"],
     ["sampling_wait_buffer", "sampling_freq"]),
    ("run_quantum_monte_carlo_and_measure_bond_autocorrelation",
     ["beta", "timesteps"], ["sampling_wait_buffer", "sampling_freq"]),
    ("get_offset", [], []),
    ("get_graph_itime", ["g"], []),
    ("clone", [], []),
]

TEMPERING = [
    ("__init__", ["edges"], ["seed", "use_allocator"]),
    ("add_graph", ["transverse", "longitudinal", "beta"],
     ["edges", "enable_rvb_update", "enable_heatbath_update", "seed",
      "use_allocator"]),
    ("get_num_graphs", [], []),
    ("get_graph_itime", ["g"], []),
    ("qmc_timesteps", ["t"], []),
    ("qmc_timesteps_sample", ["timesteps"],
     ["replica_swap_freq", "sampling_freq"]),
    ("run_quantum_monte_carlo_and_measure_variable_autocorrelation",
     ["timesteps"],
     ["sampling_wait_buffer", "replica_swap_freq", "sampling_freq"]),
    ("run_quantum_monte_carlo_and_measure_bond_autocorrelation",
     ["timesteps"],
     ["sampling_wait_buffer", "replica_swap_freq", "sampling_freq"]),
    ("get_total_swaps", [], []),
    ("clone", [], []),
    ("save_to_file", ["path"], []),
    ("read_from_file", ["path"], ["reseed"]),
]


@pytest.mark.parametrize(
    "cls,spec",
    [
        (Lattice, LATTICE),
        (ClassicIsing, CLASSIC),
        (QmcIsing, QMCISING),
        (QmcRunner, QMCRUNNER),
        (LatticeTempering, TEMPERING),
    ],
    ids=["Lattice", "ClassicIsing", "QmcIsing", "QmcRunner", "LatticeTempering"],
)
def test_method_surface(cls, spec):
    for name, required, optional in spec:
        assert hasattr(cls, name), f"{cls.__name__}.{name} missing"
        fn = getattr(cls, name)
        sig = inspect.signature(fn)
        # Keyword-only params are TPU-framework extensions beyond the
        # reference surface (e.g. ``dtau``) — positional call compatibility
        # with the reference is unaffected, so they must be defaulted and
        # are excluded from the parity list.
        for p in sig.parameters.values():
            if p.kind is inspect.Parameter.KEYWORD_ONLY:
                assert p.default is not inspect.Parameter.empty, (
                    f"{cls.__name__}.{name}: extension kwarg {p.name} must default"
                )
        params = [
            p
            for p in sig.parameters.values()
            if p.name != "self" and p.kind is not inspect.Parameter.KEYWORD_ONLY
        ]
        names = [p.name for p in params]
        want = required + optional
        assert names == want, f"{cls.__name__}.{name}: {names} != {want}"
        for p in params[len(required):]:
            assert p.default is not inspect.Parameter.empty, (
                f"{cls.__name__}.{name}: {p.name} should be optional"
            )
        for p in params[: len(required)]:
            assert p.default is inspect.Parameter.empty, (
                f"{cls.__name__}.{name}: {p.name} should be required"
            )
