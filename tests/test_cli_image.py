"""CLI-level smoke for the image entry points — ``train_image_vae.py``,
``train_image_fader.py``, ``test_mnist.py`` — on a tiny IDX/CSV corpus
written in the reference's on-disk format (reference
``train_image_vae.py:15-100``, ``train_image_fader.py:36-66``,
``test_mnist.py``). Exercises the flag surface (reg expansion, seed
selection, run-dir naming) through training, eval, cached results and
artifacts, end to end on the virtual CPU mesh.
"""

import json
import os
import sys

import pytest
from click.testing import CliRunner

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture()
def env(tmp_path, monkeypatch):
    """Tiny reference-format MNIST corpus + isolated run/dataset dirs."""
    from conftest import write_reference_mnist_corpus

    monkeypatch.setenv("ARVAE_MODELS_DIR", str(tmp_path / "models"))
    monkeypatch.setenv("ARVAE_DATASETS_DIR", str(tmp_path / "ds"))
    write_reference_mnist_corpus(tmp_path / "ds" / "mnist_data" / "plain")
    return tmp_path


def _invoke(cli_main, args):
    result = CliRunner().invoke(cli_main, args, catch_exceptions=False)
    assert result.exit_code == 0, result.output
    return result.output


def test_train_image_vae_cli_end_to_end(env):
    import train_image_vae

    out = _invoke(train_image_vae.main,
                  ["--rand", "0", "-r", "all", "--num_epochs", "1",
                   "--batch_size", "8"])
    runs = os.listdir(env / "models")
    assert len(runs) == 1, runs
    run_dir = env / "models" / runs[0]
    results = json.load(open(run_dir / "results_dict.json"))
    assert "interpretability" in results
    # eval metrics were printed and the gif artifacts exist
    assert "interpretability" in out
    gifs = [f for f in os.listdir(run_dir / "results") if f.endswith(".gif")]
    assert gifs


def test_train_image_vae_cli_test_mode_reloads(env):
    """--test loads the checkpoint written by --train and re-evals
    (reference train_image_vae.py:31 --train/--test)."""
    import train_image_vae

    _invoke(train_image_vae.main,
            ["--rand", "0", "-r", "all", "--num_epochs", "1",
             "--batch_size", "8"])
    out = _invoke(train_image_vae.main,
                  ["--test", "--rand", "0", "-r", "all",
                   "--num_epochs", "1", "--batch_size", "8"])
    assert "interpretability" in out


def test_train_image_vae_cli_rejects_unknown_reg(env):
    import train_image_vae

    result = CliRunner().invoke(
        train_image_vae.main,
        ["--rand", "0", "-r", "bogus_attr", "--num_epochs", "1"],
    )
    assert result.exit_code != 0
    assert "unknown reg_type" in result.output


def test_train_image_fader_cli_end_to_end(env):
    import train_image_fader

    _invoke(train_image_fader.main,
            ["--rand", "0", "--num_epochs", "1", "--batch_size", "8"])
    runs = [r for r in os.listdir(env / "models") if "Fader" in r]
    assert runs, os.listdir(env / "models")
    results = json.load(open(
        env / "models" / runs[0] / "results_dict.json"))
    assert "interpretability" in results


def test_judge_cli_trains_and_reports(env):
    import test_mnist as judge_cli

    out = _invoke(judge_cli.main,
                  ["--num_epochs", "1", "--batch_size", "8"])
    assert "accuracy" in out.lower()
