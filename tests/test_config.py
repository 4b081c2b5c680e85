"""Config-string semantics + protocol provenance (pure, fast tier).

The run-dir string is the experiment-management system (reference
``utils/model.py:21-41``, ``image_vae_trainer.py:105-118``); the
protocol stamp inside results_dict.json is what disambiguates runs the
string cannot (ADVICE r4: it encodes only seed/beta/gamma/delta).
"""

import json
import subprocess
import sys

import pytest

from arvae_tpu.core.config import (
    TrainerHParams,
    expand_reg_dims,
    normalize_reg_dim,
    trainer_config_string,
)

pytestmark = pytest.mark.fast


def test_config_string_matches_reference_fragments():
    h = TrainerHParams(rand=0, beta=4.0)
    assert trainer_config_string(h) == "_r_0_b_4.0_"
    h = TrainerHParams(rand=3, beta=0.001, gamma=1.0, delta=10.0,
                       reg_type=("rhy_complexity", "num_notes"),
                       reg_dim=(0, 1))
    assert trainer_config_string(h) == \
        "_r_3_b_0.001_g_1.0_d_10.0_rhy_complexity_num_notes_"
    h = TrainerHParams(rand=0, beta=1.0, capacity=50.0)
    assert trainer_config_string(h) == "_r_0_b_1.0_c_50.0_"


def test_normalize_reg_dim_scalar_and_empty():
    assert normalize_reg_dim(0, ("rhy_complexity",)) == (0,)
    assert normalize_reg_dim((1, 2), ("a", "b")) == (1, 2)
    assert normalize_reg_dim((1,), ()) == ()
    assert normalize_reg_dim(None, None) == ()


def test_expand_reg_dims_all_skips_identity():
    attr_dict = {"digit_identity": 9, "slant": 0, "thickness": 1}
    assert expand_reg_dims(("all",), attr_dict) == (0, 1)
    assert expand_reg_dims(("thickness",), attr_dict) == (1,)
    assert expand_reg_dims((), attr_dict) == ()


def test_protocol_dict_requires_training(tmp_path):
    """A trainer that never trained must stamp num_epochs=None — a
    --test reload's cache can then never pass a protocol-gated
    aggregation as a blessed run."""
    from arvae_tpu.data.dsprites import DspritesDataset
    from arvae_tpu.models import DspritesVAE
    from arvae_tpu.training.image_trainer import ImageVAETrainer

    ds = DspritesDataset(root=str(tmp_path), factor_sizes=(1, 1, 1, 2, 2, 2))
    tr = ImageVAETrainer(dataset=ds, model=DspritesVAE(), beta=1.0)
    p = tr.protocol_dict()
    assert p["num_epochs"] is None
    assert p["dataset"] == "DspritesDataset"
    assert p["factor_sizes"] == [1, 1, 1, 2, 2, 2]


def test_has_protocol_cache_gates_seed_skip(tmp_path, monkeypatch):
    """--skip_cached's predicate: a seed is skipped only when the cached
    stamp matches epochs, batch size, AND dataset identity — a --short
    factor-grid cache must not satisfy a full-grid request."""
    import os

    from arvae_tpu.data.dsprites import DspritesDataset
    from arvae_tpu.models import DspritesVAE
    from arvae_tpu.training.image_trainer import ImageVAETrainer

    monkeypatch.setenv("ARVAE_MODELS_DIR", str(tmp_path / "models"))
    ds = DspritesDataset(root=str(tmp_path), factor_sizes=(1, 1, 1, 2, 2, 2))
    tr = ImageVAETrainer(dataset=ds, model=DspritesVAE(), beta=1.0)
    assert not tr.has_protocol_cache(15, 128)  # no cache at all

    os.makedirs(tr.run_dir, exist_ok=True)
    stamp = {"num_epochs": 15, "batch_size": 128,
             "dataset": "DspritesDataset",
             "factor_sizes": [1, 1, 1, 2, 2, 2]}
    fp = os.path.join(tr.run_dir, "results_dict.json")
    with open(fp, "w") as fh:
        json.dump({"mig": 0.1, "protocol": stamp}, fh)
    assert tr.has_protocol_cache(15, 128)
    assert not tr.has_protocol_cache(100, 128)   # different protocol
    assert not tr.has_protocol_cache(15, 256)    # different batch size

    stamp["factor_sizes"] = [1, 3, 3, 10, 16, 16]  # a --short run's grid
    with open(fp, "w") as fh:
        json.dump({"mig": 0.1, "protocol": stamp}, fh)
    assert not tr.has_protocol_cache(15, 128)


def _write_cache(d, epochs):
    d.mkdir(parents=True)
    body = {"mig": 0.5, "SAP_score": 0.1}
    if epochs != "unstamped":
        body["protocol"] = {"num_epochs": epochs, "batch_size": 128}
    (d / "results_dict.json").write_text(json.dumps(body))


def test_aggregate_results_protocol_gate(tmp_path):
    """--epochs N excludes smoke-protocol and unstamped caches and says
    so; --allow-unstamped re-admits legacy caches only."""
    import os
    _write_cache(tmp_path / "M_r_0_b_4.0_", 100)
    _write_cache(tmp_path / "M_r_1_b_4.0_", 1)          # smoke run
    _write_cache(tmp_path / "M_r_2_b_4.0_", "unstamped")  # legacy
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "aggregate_results.py")
    out = subprocess.run(
        [sys.executable, script, "--epochs", "100",
         str(tmp_path / "M_r_*_b_4.0_")],
        capture_output=True, text=True, check=True).stdout
    assert "(1 runs)" in out
    assert "EXCLUDED" in out and "num_epochs=1" in out and "unstamped" in out
    out = subprocess.run(
        [sys.executable, script, "--epochs", "100", "--allow-unstamped",
         str(tmp_path / "M_r_*_b_4.0_")],
        capture_output=True, text=True, check=True).stdout
    assert "(2 runs)" in out and "num_epochs=1" in out
