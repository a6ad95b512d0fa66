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


def test_registry_defaults_match_ctor():
    """A registry default that drifts from the constructor default would
    make the CLI and the library behave differently (round-2 weak #2: the
    activation row said ReSQRT while the ctor said ReLU)."""
    sig = inspect.signature(AudioClassifier.__init__)
    for p in props.CLASSIFY_PROPERTIES:
        if p.readonly or p.attr_name not in sig.parameters:
            continue
        if p.name == "classes":        # required positional
            continue
        ctor_default = sig.parameters[p.attr_name].default
        if ctor_default is inspect.Parameter.empty:
            continue
        if isinstance(ctor_default, (int, float)) and not isinstance(
                ctor_default, bool):
            assert float(ctor_default) == float(p.default), (
                f"{p.name}: registry default {p.default} != "
                f"ctor default {ctor_default}")
        else:
            assert ctor_default == p.default or (
                ctor_default is None and p.default is None), (
                f"{p.name}: registry default {p.default!r} != "
                f"ctor default {ctor_default!r}")


REFERENCE_DEFAULT_METADATA = (
    "classes ab\n"
    "min-frequency 60.000000\n"
    "max-frequency 3992.000000\n"
    "knee-frequency 700.000000\n"
    "mfccs 0\n"
    "window-size 256\n"
    "basename classify\n"
    "delta-features 0\n"
    "focus-frequency 0.000000\n"
    "lag 0.000000\n"
    "intensity-feature 0\n"
    "confirmation-lag 0.000000\n"
    "features-offset (null)\n"
    "features-scale (null)\n"
)


def test_metadata_reference_golden(tmp_path):
    """Byte-for-byte the string construct_metadata (gstclassify.c:847-876)
    renders at element defaults: hyphenated keys in its exact order, %f
    floats, glibc "(null)" for unset strings.  The hash of these bytes is
    the filename signature, so matching bytes = matching filenames with
    reference-trained nets."""
    clf = make_clf(tmp_path)
    assert clf._construct_metadata() == REFERENCE_DEFAULT_METADATA
    # the metadata-hash filename (set_net_filename, gstclassify.c:688-705)
    from recur_tpu.utils.hashing import rnn_hash32
    sig = rnn_hash32(REFERENCE_DEFAULT_METADATA)
    clf2 = AudioClassifier(classes="ab", n_channels=2, hidden_size=9)
    assert clf2.net_filename == f"classify-{sig:x}-i40-h9-o2-8000Hz-w256.net"


def test_metadata_nondefault_window_type_is_extension_only(tmp_path):
    """window-type is this framework's extension: absent at the reference
    default (Hann) so hashes match the reference, present otherwise so a
    Vorbis-trained net still reloads onto a Vorbis frontend."""
    clf = make_clf(tmp_path)
    assert "window-type" not in clf._construct_metadata()
    clf = make_clf(tmp_path, window_type=WindowType.VORBIS)
    assert "window-type 2\n" in clf._construct_metadata()


def test_normalisation_persists_through_save_load(tmp_path):
    """Round-2 missing #1: a normalised classifier saved and reloaded must
    still run normalised features."""
    import numpy as np
    clf = make_clf(tmp_path, mfccs=13)
    offs = np.arange(13, dtype=np.float32) * 0.5 + 1.0
    scls = np.linspace(0.5, 2.0, 13).astype(np.float32)
    clf.set_feature_normalisation(offsets=offs, scales=scls)
    clf.save()
    md = clf.net.metadata
    assert "features-offset " in md and "(null)" not in md.split(
        "features-offset ")[1].splitlines()[0]

    clf2 = make_clf(tmp_path, mfccs=13, force_load=True)
    np.testing.assert_allclose(clf2.feature_offsets, offs, rtol=1e-6)
    np.testing.assert_allclose(clf2.feature_scales, scls, rtol=1e-6)

    # and the features actually differ when the normalisation is dropped
    rng = np.random.RandomState(0)
    frames = (rng.randn(1, 2, 256) * 3000).astype(np.float32)
    f_norm = np.asarray(clf2._features_for_frames(frames))
    clf3 = make_clf(tmp_path, mfccs=13)     # fresh: no normalisation
    f_raw = np.asarray(clf3._features_for_frames(frames))
    assert not np.allclose(f_norm, f_raw)


def test_parse_reference_shaped_metadata():
    """A metadata block exactly as a reference-trained net would carry it
    parses completely — including the keys the reference's own sscanf
    cannot recover (gstclassify.c:898-916)."""
    s = ("classes Mm,Kk\n"
         "min-frequency 60.000000\n"
         "max-frequency 3992.000000\n"
         "knee-frequency 700.000000\n"
         "mfccs 13\n"
         "window-size 512\n"
         "basename kiwi\n"
         "delta-features 1\n"
         "focus-frequency 0.000000\n"
         "lag 1.500000\n"
         "intensity-feature 1\n"
         "confirmation-lag 2.000000\n"
         "features-offset 1.5:2.5:3.5\n"
         "features-scale 0.5:0.25\n")
    kv = props.parse_metadata(s)
    assert kv["classes"] == "Mm,Kk"
    assert kv["basename"] == "kiwi"
    assert kv["mfccs"] == 13
    assert kv["window_size"] == 512
    assert kv["lag"] == 1.5
    assert kv["confirmation_lag"] == 2.0
    assert props.parse_colon_floats(kv["features_offset"], 28) == [
        1.5, 2.5, 3.5]
    assert props.parse_colon_floats(kv["features_scale"], 28) == [0.5, 0.25]
    # legacy (rounds 1-2) underscored keys still parse
    kv2 = props.parse_metadata("window_size 512\nknee_frequency 650.0\n")
    assert kv2["window_size"] == 512
    assert kv2["knee_frequency"] == 650.0


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


# ---- the round-3 property tail: each knob exercised once ----

class TestPropertyTail:
    def test_adagrad_ballast_seeds_accumulators(self, tmp_path):
        import numpy as np
        clf = make_clf(tmp_path, learning_style=4, adagrad_ballast=123.0)
        assert float(np.asarray(clf.bptt.ih_momentum).min()) == 123.0
        assert float(np.asarray(clf.bptt.ho_momentum).max()) == 123.0
        # non-adagrad styles are untouched
        clf2 = make_clf(tmp_path, learning_style=1, adagrad_ballast=123.0)
        assert float(np.asarray(clf2.bptt.ih_momentum).max()) == 0.0

    def test_top_learn_rate_scale_lands_in_bptt(self, tmp_path):
        clf = make_clf(tmp_path, top_learn_rate_scale=0.25)
        assert float(clf.bptt.ho_scale) == pytest.approx(0.25)
        assert clf.hyper.bottom_learn_rate_scale == 1.0
        clf2 = make_clf(tmp_path, bottom_learn_rate_scale=0.5)
        assert clf2.hyper.bottom_learn_rate_scale == 0.5

    def test_weight_init_scale_changes_weights(self, tmp_path):
        import numpy as np
        a = make_clf(tmp_path)
        b = make_clf(tmp_path, weight_init_scale=0.5)
        wa = np.asarray(a.params.ih)
        wb = np.asarray(b.params.ih)
        assert not np.allclose(wa, wb)
        # pure scaling: same sparsity pattern
        np.testing.assert_array_equal(wa != 0, wb != 0)

    def test_fan_in_sum_selects_fan_in_method(self, tmp_path):
        import numpy as np
        dwim = make_clf(tmp_path, weight_fan_in_sum=2.0)
        flat = make_clf(tmp_path)
        explicit = make_clf(tmp_path, weight_fan_in_sum=2.0,
                            weight_init_method=2)
        # the DWIM path (gstclassify.c:1046-1056) must equal the explicit
        # fan-in init, and differ from the flat default
        np.testing.assert_array_equal(np.asarray(dwim.params.ih),
                                      np.asarray(explicit.params.ih))
        assert not np.allclose(np.asarray(dwim.params.ih),
                               np.asarray(flat.params.ih))

    def test_weight_noise_applied_at_set_start(self, tmp_path):
        import numpy as np
        clf = make_clf(tmp_path, weight_noise=0.01)
        before = np.asarray(clf.params.ih).copy()
        clf.begin_set()
        after = np.asarray(clf.params.ih)
        assert not np.allclose(before, after)
        # the pad region stays zero (live-region-only noise)
        assert float(after[:, 0].sum()) == before[:, 0].sum()
        # negative value scales by -learn_rate (gstclassify.c:1363-1369)
        clf2 = make_clf(tmp_path, weight_noise=-1.0)
        b2 = np.asarray(clf2.params.ih).copy()
        clf2.begin_set()
        d = np.abs(np.asarray(clf2.params.ih) - b2)
        assert 0 < d.max() < 0.01   # ~1e-4 deviation, not 1.0

    def test_random_alignment_shifts_stream(self, tmp_path):
        import numpy as np
        clf = make_clf(tmp_path, random_alignment=True)
        clf.begin_set()
        # the JSF64 stream with seed 11 gives a deterministic offset
        shift = clf._skip_samples or -clf._pending.shape[1]
        assert shift != 0
        assert -clf.window_size // 2 <= shift < clf.window_size // 2
        # feeding consumes the skip before buffering
        if clf._skip_samples:
            n0 = clf._skip_samples
            clf.feed(np.zeros((2, n0 + 4), np.float32))
            assert clf._skip_samples == 0
            assert clf._pending.shape[1] == 4

    def test_pgm_dump_property_writes_images(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        clf = make_clf(tmp_path)
        clf.set_property("pgm-dump", "ihw how")
        import glob
        assert glob.glob(str(tmp_path / "*.p?m")), "no weight images dumped"

    def test_features_file_dumps_rows(self, tmp_path):
        import numpy as np
        path = str(tmp_path / "feats.csv")
        clf = make_clf(tmp_path, features_file=path)
        clf.set_property("target", "c0t0:a c1t0:b")
        rng = np.random.RandomState(0)
        clf.feed((rng.randn(2, 256 * 70) * 1000).astype(np.float32))
        clf.flush()
        clf._features_file.close()
        lines = open(path).read().splitlines()
        assert lines and lines[0].startswith("channel 0,")
        assert len(lines[0].split(",")) == 1 + clf.n_features

    def test_windows_per_second_readonly(self, tmp_path):
        clf = make_clf(tmp_path, window_size=256)
        assert clf.get_property("windows-per-second") == pytest.approx(62.5)
        with pytest.raises(KeyError):
            clf.set_property("windows-per-second", 10)

    def test_confirmation_lag_round_trips(self, tmp_path):
        clf = make_clf(tmp_path, confirmation_lag=2.5)
        clf.save()
        clf2 = make_clf(tmp_path, force_load=True)
        assert clf2.confirmation_lag == pytest.approx(2.5)
