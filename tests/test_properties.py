"""The single-source classify property registry (audio/properties.py) must
agree with the AudioClassifier constructor, the metadata codec, the live
set_property surface and the generated CLI — the SURVEY §5.6 anti-drift
guarantee the reference lacks (its four hand-maintained lists)."""

import argparse
import inspect

import pytest

from recur_tpu.audio import properties as props
from recur_tpu.audio.classify import AudioClassifier
from recur_tpu.dsp.windows import WindowType


def make_clf(tmp_path, **kw):
    kw.setdefault("classes", "ab")
    kw.setdefault("n_channels", 2)
    kw.setdefault("hidden_size", 9)
    kw.setdefault("net_filename", str(tmp_path / "p.net"))
    return AudioClassifier(**kw)


def test_registry_metadata_roundtrip(tmp_path):
    clf = make_clf(tmp_path, window_type=WindowType.VORBIS,
                   knee_frequency=650.0, mfccs=13)
    s = clf._construct_metadata()
    kv = props.parse_metadata(s)
    # every metadata prop appears, with the constructor's value
    for p in props.metadata_props():
        key = p.name.replace("-", "_")
        assert key in kv, key
    assert kv["window_type"] == int(WindowType.VORBIS)
    assert kv["knee_frequency"] == pytest.approx(650.0)
    assert kv["mfccs"] == 13
    assert kv["classes"] == "ab"


def test_registry_matches_ctor_signature():
    sig = inspect.signature(AudioClassifier.__init__)
    for p in props.CLASSIFY_PROPERTIES:
        if not p.cli:
            continue
        assert p.attr_name in sig.parameters, (
            f"registry prop {p.name} has no ctor kwarg {p.attr_name}")


def test_immediate_props_settable(tmp_path):
    clf = make_clf(tmp_path)
    clf.set_property("learn-rate", 0.5)
    assert clf.learn_rate == pytest.approx(0.5)
    clf.set_property("momentum", 0.7)
    assert clf.momentum == pytest.approx(0.7)
    clf.set_property("balanced-training", 1.5)
    assert clf.balanced_training_bias == 1.5
    clf.set_property("ignored-windows", 3)
    assert clf.ignored_windows == 3
    clf.set_property("training", False)
    assert clf.training is False
    clf.set_property("target", "c0t0:a")
    assert clf.events
    clf.set_property("forget", 1)
    # all registry-immediate names are in the alias table
    for name in props.immediate_aliases():
        assert name in clf.PROPERTY_ALIASES


def test_cli_generated_from_registry():
    p = argparse.ArgumentParser()
    props.add_classify_args(p)
    helptext = p.format_help()
    for pr in props.CLASSIFY_PROPERTIES:
        if pr.cli:
            assert f"--{pr.name}" in helptext, pr.name
    # parsed defaults land on ctor kwarg names
    opt = p.parse_args([])
    kw = props.classifier_kwargs_from_args(opt)
    assert kw["window_size"] == 256
    assert kw["n_channels"] == 12
    assert kw["weight_init_method"] == 1


def test_window_type_reconciled_on_load(tmp_path):
    """A net trained with a Vorbis window must reload onto a Vorbis
    frontend even if the constructor asked for Hann (round-1 weak #5)."""
    clf = make_clf(tmp_path, window_type=WindowType.VORBIS)
    clf.save()
    clf2 = make_clf(tmp_path, window_type=WindowType.HANN, force_load=True)
    assert WindowType(clf2.window_type) == WindowType.VORBIS
    import numpy as np
    np.testing.assert_allclose(np.asarray(clf2.binner.mask),
                               np.asarray(clf.binner.mask))
