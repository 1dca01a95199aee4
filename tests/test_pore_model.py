"""Pore model loading/registry tests."""

import os

import numpy as np
import pytest

from nanopolish_tpu.models.pore_model import PoreModel, PoreModelSet, BUILTIN_NPZ


def test_builtin_npz_exists():
    assert os.path.exists(BUILTIN_NPZ)


def test_builtin_models_load():
    ps = PoreModelSet()
    m = ps.get_model("r9.4_450bps", "nucleotide", "template", 6)
    assert m.num_states == 4096
    assert m.k == 6
    # spot-check published values (r9.4 450bps 6-mer template, AAAAAA row)
    assert abs(m.level_mean[0] - 86.48634) < 1e-4
    assert abs(m.level_stdv[0] - 1.51785) < 1e-4
    # derived params
    assert np.allclose(m.sd_lambda, m.sd_mean ** 3 / m.sd_stdv ** 2)
    assert np.allclose(m.level_log_stdv, np.log(m.level_stdv))


def test_builtin_model_inventory():
    ps = PoreModelSet()
    expected = [
        ("r9.4_450bps", "nucleotide", "template", 6),
        ("r9.4_450bps", "nucleotide", "template", 5),
        ("r9.4_450bps", "cpg", "template", 6),
        ("r9.4_450bps", "gpc", "template", 6),
        ("r9.4_450bps", "dam", "template", 6),
        ("r9.4_450bps", "dcm", "template", 6),
        ("r9.4_70bps", "u_to_t_rna", "template", 5),
        ("r9_250bps", "nucleotide", "template", 6),
        ("r9_250bps", "nucleotide", "complement.pop1", 6),
        ("r9_250bps", "nucleotide", "complement.pop2", 6),
        ("r9_250bps", "cpg", "template", 6),
    ]
    for key in expected:
        assert ps.has_model(*key), key


def test_model_file_roundtrip(tmp_path):
    ps = PoreModelSet()
    m = ps.get_model("r9.4_450bps", "nucleotide", "template", 5)
    path = str(tmp_path / "test.model")
    m.write(path, model_name="test_model")
    m2 = PoreModel.from_file(path)
    assert m2.k == m.k
    assert m2.kit == m.kit
    assert m2.strand == m.strand
    assert m2.alphabet.name == "nucleotide"
    assert np.allclose(m2.level_mean, m.level_mean, atol=1e-5)
    assert np.allclose(m2.level_stdv, m.level_stdv, atol=1e-5)


def test_fofn_initialize(tmp_path):
    ps0 = PoreModelSet()
    m = ps0.get_model("r9.4_450bps", "cpg", "template", 6)
    mm = m.with_states(m.level_mean + 1.0, m.level_stdv)
    mm.kit = "customkit"
    path = str(tmp_path / "custom.model")
    mm.write(path)
    fofn = tmp_path / "models.fofn"
    fofn.write_text(path + "\n")
    ps = PoreModelSet()
    ps.initialize(str(fofn))
    got = ps.get_model("customkit", "cpg", "template", 6)
    assert abs(got.level_mean[0] - (m.level_mean[0] + 1.0)) < 1e-4


def test_unknown_model_raises():
    ps = PoreModelSet()
    with pytest.raises(KeyError):
        ps.get_model("nope", "nucleotide", "template", 6)
