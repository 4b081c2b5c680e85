"""CLI-level smoke for the round-3 variant flags on train_measure_vae:
``--glsr`` (MeasureVAETrainerGLSR) and ``--sampling multinomial``
(free-running feedback through jax.random.categorical / the kernel's
Gumbel-max path), each for one epoch on the tiny synthetic corpus."""

import json
import os
import sys

import pytest
from click.testing import CliRunner

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture()
def env(tmp_path, monkeypatch):
    monkeypatch.setenv("ARVAE_MODELS_DIR", str(tmp_path / "models"))
    monkeypatch.setenv("ARVAE_DATASETS_DIR", str(tmp_path / "ds"))
    return tmp_path


def _run(args):
    import train_measure_vae

    runner = CliRunner()
    result = runner.invoke(train_measure_vae.main, args,
                           catch_exceptions=False)
    assert result.exit_code == 0, result.output
    return result.output


def test_glsr_cli_trains_and_evals(env):
    out = _run(["--rand", "0", "--glsr", "--short", "--num_epochs", "1",
                "--batch_size", "32"])
    # GLSR gets its own run dir (model_repr suffix) with cached results
    runs = os.listdir(env / "models")
    glsr_runs = [r for r in runs if "GLSR" in r]
    assert glsr_runs, runs
    results = json.load(open(
        env / "models" / glsr_runs[0] / "results_dict.json"))
    assert "interpretability" in results


def test_multinomial_cli_trains_and_evals(env):
    _run(["--rand", "0", "-r", "all", "--sampling", "multinomial",
          "--short", "--num_epochs", "1", "--batch_size", "32"])
    runs = os.listdir(env / "models")
    multi = [r for r in runs if "multinomial" in r]
    assert multi, runs
    results = json.load(open(
        env / "models" / multi[0] / "results_dict.json"))
    assert "Corr_score" in results


def test_glsr_note_density_maps_to_num_notes(env):
    out = _run(["--rand", "0", "--glsr", "-r", "note_density", "--short",
                "--num_epochs", "1", "--batch_size", "32"])
    runs = [r for r in os.listdir(env / "models") if "GLSR" in r]
    assert runs and "num_notes" in runs[0], runs


def test_glsr_rejects_unsupported_reg(env):
    import train_measure_vae
    runner = CliRunner()
    result = runner.invoke(
        train_measure_vae.main,
        ["--glsr", "-r", "pitch_range", "--short", "--num_epochs", "1"],
    )
    assert result.exit_code != 0
    assert "differentiable" in result.output
