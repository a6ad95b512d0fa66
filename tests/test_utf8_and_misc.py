"""UTF-8 handling (the intent of test/test_utf8.c), kv logs, colour, pgm,
video_io, and the forget/profiling helpers."""

import numpy as np
import pytest

import jax.numpy as jnp

from recur_tpu import nn
from recur_tpu.models.alphabet import Alphabet, Metadata, _iter_codepoints
from recur_tpu.ops.core import forget_state
from recur_tpu.utils.colour import bar_chart, colourise_float01, unicode_bar
from recur_tpu.utils.kvlog import KvLog
from recur_tpu.utils.pgm import TemporalPPM, colour_weights, pgm_dump
from recur_tpu.utils.video_io import read_y4m, write_y4m


class TestUtf8:
    def test_roundtrip(self):
        text = "kia ora, ā ₤ \U0001F600"
        codes = list(_iter_codepoints(text, utf8=True))
        assert codes == [ord(c) for c in text]

    def test_bad_utf8_truncates(self):
        """Malformed input yields the valid prefix (reference breaks at the
        error)."""
        bad = "abc".encode() + b"\xff\xfe" + "def".encode()
        codes = list(_iter_codepoints(bad, utf8=True))
        assert codes == [ord(c) for c in "abc"]

    def test_nul_stops(self):
        assert list(_iter_codepoints(b"ab\x00cd", utf8=False)) == [97, 98]

    def test_alphabet_find_survives_bad_utf8(self):
        text = b"hello world " * 100 + b"\xff\xff"
        a = Alphabet.find(text, threshold=1e-3, utf8=True)
        assert len(a) > 3

    def test_metadata_urlencoding_roundtrip(self):
        m = Metadata(alphabet="a b%c\nd\x01", collapse_chars="\x7f~",
                     utf8=True, collapse_space=True, case_insensitive=False)
        s = m.construct()
        m2 = Metadata.parse(s)
        assert m2.alphabet == m.alphabet
        assert m2.collapse_chars == m.collapse_chars
        assert (m2.utf8, m2.collapse_space, m2.case_insensitive) == \
            (True, True, False)


class TestKvLog:
    def test_log_format(self, tmp_path):
        p = tmp_path / "t.log"
        log = KvLog(str(p))
        log.log_float("t_error", 0.123456)
        log.log_int("generation", 42)
        log.close()
        lines = p.read_text().splitlines()
        assert lines == ["t_error 0.12346", "generation 42"]

    def test_set_file_append(self, tmp_path):
        p = tmp_path / "a.log"
        log = KvLog()
        log.set_file(str(p), append=False, generation=7)
        log.close()
        assert "generation 7" in p.read_text()


class TestColour:
    def test_bars(self):
        assert unicode_bar(0.0) == " "
        assert unicode_bar(1.0) == "█"
        s = bar_chart([0.0, 0.5, 1.0], highlight=1)
        assert "█" in s and "\033" in s

    def test_colourise(self):
        assert colourise_float01(0.95) != colourise_float01(0.2)


class TestPgm:
    def test_pgm_dump(self, tmp_path):
        p = tmp_path / "x.pgm"
        pgm_dump(np.random.default_rng(0).normal(size=(8, 12)), str(p))
        data = p.read_bytes()
        assert data.startswith(b"P5\n12 8\n255\n")
        assert len(data) == len(b"P5\n12 8\n255\n") + 96

    def test_colour_weights(self):
        w = np.array([[-1.0, 0.0, 1.0]])
        img = colour_weights(w)
        assert img[0, 0, 0] == 255 and img[0, 0, 1] == 0   # negative = red
        assert img[0, 2, 1] == 255 and img[0, 2, 0] == 0   # positive = green

    def test_temporal_ppm(self, tmp_path):
        t = TemporalPPM(4, 3, "act", directory=str(tmp_path))
        assert t.add_row([1, 2, 3, 4]) is None
        assert t.add_row([1, 2, 3, 4]) is None
        path = t.add_row([0, 0, 0, 0])
        assert path and path.endswith(".ppm")


class TestForget:
    def test_forget_state(self):
        cfg = nn.RnnConfig(input_size=3, hidden_size=5, output_size=3)
        s = nn.new_state(cfg, 2)
        s = nn.RnnState(hidden=s.hidden + 1.0, history=s.history + 1.0,
                        head=s.head)
        f = forget_state(s, bptt_too=True)
        assert float(jnp.abs(f.hidden).sum()) == 0.0
        assert float(jnp.abs(f.history).sum()) == 0.0
        f2 = forget_state(s, bptt_too=False)
        assert float(jnp.abs(f2.history).sum()) > 0.0


def test_case_insensitive_lut_is_ascii_only():
    """C-locale case folding (charmodel-init.c:259-262 'works for ascii
    only'): Python's unicode-aware islower must not leak in."""
    from recur_tpu.models.alphabet import Alphabet

    a = Alphabet.from_chars(" aé", case_insensitive=True, utf8=True)
    lut = a.char_lut()
    assert lut[ord("A")] == lut[ord("a")]        # ASCII folds
    assert ord("É") not in lut                   # é does NOT fold
    enc = a.encode("É")
    assert enc[0] == lut[ord(" ")]               # unknown -> space


def test_urldecode_edges():
    from recur_tpu.models.alphabet import _urldecode

    assert _urldecode("abc%20d") == "abc d"
    assert _urldecode("abc%4") == "abc%4"        # truncated escape: literal
    assert _urldecode("100%zz") == "100%zz"      # non-hex escape: literal
    assert _urldecode("café") == "café"   # latin-1 literal
    assert _urldecode("Σ") == "Σ"      # >255 literal survives
