"""CLI surface: the runtime equivalents of the reference's executables
(``main.cu`` solver binary, ``gpad.m`` closed loop)."""

import json

import numpy as np
import pytest

from tpu_gpad.cli import main


def run_cli(capsys, *argv):
    rc = main(list(argv))
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    return [json.loads(line) for line in out]


def test_solve_battery(capsys):
    (out,) = run_cli(
        capsys, "solve", "--problem", "battery", "--cells", "3",
        "--horizon", "6", "--iterations", "60", "--batch", "4",
    )
    assert out["n_u"] == 3 and out["horizon"] == 6
    assert out["m"] == 4 * 3 * 6 + 2 * 6  # m = 4 n_u N + 2N
    assert out["iterations"] == 60
    assert len(out["u_star"]) == 3
    # charge conservation is a dualized constraint: at 60 iterations it holds
    # to ~GPAD's O(1/k^2) primal infeasibility, not machine precision
    assert abs(sum(out["u_star"])) < 5e-3


def test_solve_eps_mode(capsys):
    (out,) = run_cli(
        capsys, "solve", "--cells", "3", "--horizon", "6",
        "--iterations", "400", "--mode", "eps", "--eps-g", "1e-4",
        "--eps-v", "1e-4", "--batch", "2",
    )
    assert out["converged_all"]
    assert out["iterations"] <= 400


def test_solve_dataset_roundtrip(capsys, tmp_path):
    """export -> solve --dataset must agree with solving the problem directly."""
    ds_path = str(tmp_path / "input_1.txt")
    (exp,) = run_cli(
        capsys, "export", "--cells", "3", "--horizon", "4",
        "--iterations", "80", "--seed", "3", "--out", ds_path,
    )
    assert exp["m"] == 4 * 3 * 4 + 2 * 4
    (from_file,) = run_cli(
        capsys, "solve", "--dataset", ds_path, "--iterations", "80")
    # direct solve from the same seeded x0 (dense layout to match export)
    x0_file = tmp_path / "x0.txt"
    np.savetxt(x0_file, np.asarray([exp["x0"]], dtype=np.float32))
    (direct,) = run_cli(
        capsys, "solve", "--cells", "3", "--horizon", "4",
        "--iterations", "80", "--x0", str(x0_file), "--paired", "off",
    )
    np.testing.assert_allclose(
        from_file["u_star"], direct["u_star"], atol=5e-5)


def test_closedloop(capsys):
    (out,) = run_cli(
        capsys, "closedloop", "--cells", "3", "--horizon", "4",
        "--iterations", "40", "--steps", "25", "--warm-start",
    )
    assert out["steps"] == 25
    assert len(out["final_state"]) == 3
    assert out["mean_iterations"] == 40


def test_sweep_with_checkpoint(capsys, tmp_path):
    ck = str(tmp_path / "sweep.npz")
    res = str(tmp_path / "out.npz")
    out, saved = run_cli(
        capsys, "sweep", "--cells", "3", "--horizon", "4",
        "--iterations", "40", "--batch", "40", "--chunk-size", "16",
        "--checkpoint", ck, "--out", res,
    )
    assert out["chunks"] == 3 and out["scenarios"] == 40
    with np.load(res) as f:
        assert f["U"].shape == (40, 3)


def test_info_with_bound(capsys):
    (out,) = run_cli(
        capsys, "info", "--cells", "3", "--horizon", "4",
        "--bound", "--eps-v", "1e-3",
    )
    assert out["n_z"] == 12 and out["m"] == 56
    assert out["certified_iterations"] > 0
    assert out["L"] > 0


def test_unknown_problem_rejected(capsys):
    with pytest.raises(SystemExit):
        main(["solve", "--problem", "nonsense"])


def test_sweep_sharded(capsys, tmp_path):
    """--sharded spreads chunks over the (virtual 8-device) mesh, with a
    ragged last chunk exercising the padding path."""
    res = str(tmp_path / "out.npz")
    out, saved = run_cli(
        capsys, "sweep", "--cells", "3", "--horizon", "4",
        "--iterations", "40", "--batch", "44", "--chunk-size", "16",
        "--sharded", "--out", res,
    )
    assert out["scenarios"] == 44 and out["converged_all"] in (True, False)
    direct, = run_cli(
        capsys, "sweep", "--cells", "3", "--horizon", "4",
        "--iterations", "40", "--batch", "44", "--chunk-size", "16",
    )
    with np.load(res) as f:
        U_sharded = f["U"]
    assert U_sharded.shape == (44, 3)


def test_export_aot_artifact(capsys, tmp_path):
    """--aot writes a jax.export artifact that reloads and solves."""
    path = str(tmp_path / "solver.bin")
    (out,) = run_cli(
        capsys, "export", "--cells", "3", "--horizon", "4",
        "--iterations", "40", "--aot", "--out", path,
    )
    assert out["bytes"] > 0 and out["batch"] == "symbolic"
    from tpu_gpad.aot import load_solver

    solve = load_solver(path)
    res = solve(np.zeros((5, 3), dtype=np.float32))
    assert res["u"].shape == (5, 3)


def test_stagewise_rejected_on_condensed_only_subcommands(capsys):
    """Forced --engine stagewise must work or raise, never silently remap
    to the condensed path (closedloop/sweep/solve --dataset are
    condensation-only)."""
    with pytest.raises(SystemExit, match="stagewise"):
        main(["closedloop", "--problem", "battery", "--cells", "2",
              "--horizon", "4", "--steps", "2", "--engine", "stagewise"])
    with pytest.raises(SystemExit, match="stagewise"):
        main(["sweep", "--problem", "battery", "--cells", "2",
              "--horizon", "4", "--batch", "4", "--engine", "stagewise"])


def test_info_stagewise(capsys):
    (out,) = run_cli(
        capsys, "info", "--problem", "battery", "--cells", "2",
        "--horizon", "5", "--engine", "stagewise",
    )
    assert out["engine"] == "stagewise"
    assert out["L"] > 0
    assert out["stagewise_data_mb"] > 0
    assert out["condensed_operand_mb"] > 0
