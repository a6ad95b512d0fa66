"""Alphabet discovery, text encoding and net metadata for char models.

Reimplements the charmodel-init.c semantics:
  * frequency-threshold alphabet discovery with digit/alpha count adjustment
    (rnn_char_find_alphabet_s, charmodel-init.c:31-157)
  * codepoint→index LUT with collapse/space/case rules
    (rnn_char_new_char_lut, :238-265)
  * encode/decode with optional space collapsing (:270-329, :444-477)
  * url-encoded key-value metadata blobs stored inside .net files
    (rnn_char_construct_metadata / load, :532-623)
  * deterministic net filenames embedding the metadata hash (:647-664)

Character classes follow C-locale rules (explicit ASCII sets), not Python's
unicode-aware str methods, to match the reference byte-for-byte.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import numpy as np

from recur_tpu.utils.hashing import rnn_hash32

# rnn_char_flags (charmodel.h:9-13)
FLAG_CASE_INSENSITIVE = 1
FLAG_UTF8 = 2
FLAG_COLLAPSE_SPACE = 4

_C_SPACE = frozenset(b" \t\n\v\f\r")
_C_DIGITS = frozenset(b"0123456789")
_C_ALPHA = frozenset(b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
_C_UPPER = frozenset(b"ABCDEFGHIJKLMNOPQRSTUVWXYZ")
_C_LOWER = frozenset(b"abcdefghijklmnopqrstuvwxyz")


def _isspace(c: int) -> bool:
    return c < 256 and c in _C_SPACE


def _isdigit(c: int) -> bool:
    return c < 256 and c in _C_DIGITS


def _isalpha(c: int) -> bool:
    return c < 256 and c in _C_ALPHA


def _isupper(c: int) -> bool:
    return c < 256 and c in _C_UPPER


def _iter_codepoints(text: bytes | str, utf8: bool):
    """Yield character codes the way the reference reads them: utf8
    codepoints via read_utf8_char, else raw bytes.  A malformed UTF-8
    sequence stops iteration at the error (charmodel-init.c:49-63 prints a
    unicode error and breaks)."""
    if isinstance(text, str):
        text = text.encode("utf-8")
    if utf8:
        try:
            decoded = text.decode("utf-8")
        except UnicodeDecodeError as e:
            decoded = text[:e.start].decode("utf-8")
        for ch in decoded:
            c = ord(ch)
            if c == 0:
                return
            yield c
    else:
        for c in text:
            if c == 0:
                return
            yield c


@dataclasses.dataclass
class Alphabet:
    """RnnCharAlphabet: codepoints, collapsed codepoints, flags."""
    points: list[int] = dataclasses.field(default_factory=list)
    collapsed_points: list[int] = dataclasses.field(default_factory=list)
    flags: int = 0

    # -- flag helpers --
    @property
    def utf8(self) -> bool:
        return bool(self.flags & FLAG_UTF8)

    @property
    def case_insensitive(self) -> bool:
        return bool(self.flags & FLAG_CASE_INSENSITIVE)

    @property
    def collapse_space(self) -> bool:
        return bool(self.flags & FLAG_COLLAPSE_SPACE)

    def __len__(self) -> int:
        return len(self.points)

    @staticmethod
    def set_flags(case_insensitive=False, utf8=False, collapse_space=False) -> int:
        return ((FLAG_CASE_INSENSITIVE if case_insensitive else 0)
                | (FLAG_UTF8 if utf8 else 0)
                | (FLAG_COLLAPSE_SPACE if collapse_space else 0))

    # ---- discovery (rnn_char_find_alphabet_s) ----
    @classmethod
    def find(cls, text: bytes | str, threshold: float = 1e-5,
             digit_adjust: float = 1.0, alpha_adjust: float = 1.0,
             case_insensitive: bool = False, utf8: bool = False,
             collapse_space: bool = False) -> "Alphabet":
        flags = cls.set_flags(case_insensitive, utf8, collapse_space)
        counts: dict[int, int] = {}
        n = 0
        prev = 0
        for c in _iter_codepoints(text, utf8):
            if collapse_space and _isspace(c):
                c = 32
                if c == prev:
                    continue
            if case_insensitive and c < 0x80 and _isupper(c):
                c += 32
            n += 1
            counts[c] = counts.get(c, 0) + 1
            prev = c
        if n == 0:
            raise ValueError("no text to find alphabet in")

        def adjust(i: int, count: int) -> int:
            if count and i < 256:
                if _isdigit(i):
                    return int(count * digit_adjust + 0.5)
                if _isalpha(i):
                    return int(count * alpha_adjust + 0.5)
            return count

        min_count = max(math.ceil(threshold * n), 1)
        # representative of the collapsed chars: max raw count among losers
        max_cc, max_cp = 0, 0
        for i in sorted(counts):
            count = counts[i]
            if adjust(i, count) < min_count and count > max_cc:
                max_cc, max_cp = count, i
        points: list[int] = []
        collapsed: list[int] = []
        if max_cc:
            points.append(max_cp)
        for i in sorted(counts):
            if max_cc and i == max_cp:
                continue
            count = counts[i]
            if adjust(i, count) >= min_count:
                if len(points) == 256:
                    raise ValueError("alphabet overflow (>256)")
                points.append(i)
            else:
                if len(collapsed) == 256:
                    raise ValueError("collapsed overflow (>256)")
                collapsed.append(i)
        if not points:
            raise ValueError("empty alphabet")
        return cls(points=points, collapsed_points=collapsed, flags=flags)

    @classmethod
    def from_file(cls, filename: str, **kwargs) -> "Alphabet":
        with open(filename, "rb") as f:
            return cls.find(f.read(), **kwargs)

    @classmethod
    def from_chars(cls, alphabet: str, collapse_chars: str = "",
                   case_insensitive=False, utf8=False,
                   collapse_space=False) -> "Alphabet":
        """Build from explicit strings (the --alphabet CLI path and
        rnn_char_new_alphabet_from_net, charmodel-init.c:725-741)."""
        flags = cls.set_flags(case_insensitive, utf8, collapse_space)
        if utf8:
            points = [ord(c) for c in alphabet]
            collapsed = [ord(c) for c in collapse_chars]
        else:
            points = list(alphabet.encode("utf-8", errors="replace")[:256])
            collapsed = list(collapse_chars.encode("utf-8", errors="replace")[:256])
        return cls(points=points, collapsed_points=collapsed, flags=flags)

    # ---- LUT + encode/decode ----
    def _find_space(self) -> int:
        """find_space (charmodel-init.c:224-235)."""
        for i, p in enumerate(self.points):
            if p == 32:
                return i
        return 0

    def char_lut(self) -> dict[int, int]:
        """rnn_char_new_char_lut as a dict with a default (space)."""
        lut: dict[int, int] = {}
        collapse_target = 0
        for c in self.collapsed_points:
            lut[c] = collapse_target
        for i, c in enumerate(self.points):
            lut[c] = i
            # C-locale islower/toupper: ASCII only, like the reference
            # ("FIXME: case insensitivity works for ascii only",
            # charmodel-init.c:259-262) — Python's unicode-aware islower
            # would also map e.g. Σ→σ and diverge from the C module
            if self.case_insensitive and c in _C_LOWER:
                lut[c - 32] = i
        return lut

    def encode(self, text: bytes | str) -> np.ndarray:
        """rnn_char_alloc_encoded_text: text → uint8 symbol indices."""
        lut = self.char_lut()
        space = self._find_space()
        collapse = self.collapse_space
        out = np.empty(len(text) if isinstance(text, (bytes, bytearray))
                       else len(text.encode("utf-8")), dtype=np.uint8)
        j = 0
        prev = space
        for chr_code in _iter_codepoints(text, self.utf8):
            c = lut.get(chr_code, space)
            if collapse:
                if c != space or prev != space:
                    prev = c
                    out[j] = c
                    j += 1
            else:
                out[j] = c
                j += 1
        return out[:j].copy()

    def decode(self, symbols: Sequence[int]) -> str:
        """rnn_char_uncollapse_text: symbol indices → text."""
        chars = []
        for s in symbols:
            code = self.points[int(s)]
            if code == 0:
                break
            chars.append(chr(code))
        return "".join(chars)

    def get_codepoint(self, s: str) -> int:
        """rnn_char_get_codepoint: index of first char of s, or -1."""
        if not s:
            return -1
        p = ord(s[0]) if self.utf8 else s.encode("utf-8")[0]
        try:
            return self.points.index(p)
        except ValueError:
            return -1

    # -- string views --
    def points_string(self) -> str:
        return "".join(chr(p) for p in self.points)

    def collapsed_string(self) -> str:
        return "".join(chr(p) for p in self.collapsed_points)


# --------------------------------------------------------------------------
# metadata (RnnCharMetadata)
# --------------------------------------------------------------------------

def _urlencode(s: str) -> str:
    """urlencode_alloc (charmodel-init.c:482-504): escape c <= 32, >= 127,
    and '%'."""
    out = []
    for b in s.encode("utf-8"):
        if 32 < b < 127 and b != ord("%"):
            out.append(chr(b))
        else:
            out.append(f"%{b >> 4:x}{b & 15:x}")
    return "".join(out)


def _urldecode(s: str) -> str:
    """urldecode_alloc (charmodel-init.c:507-528), byte-wise and tolerant:
    a truncated or non-hex escape passes through literally, and literal
    non-Latin-1 characters (possible only in hand-edited metadata) are
    re-encoded as their UTF-8 bytes instead of raising."""
    out = bytearray()
    i = 0
    while i < len(s):
        c = s[i]
        if c == "%" and i + 3 <= len(s):
            try:
                out.append(int(s[i + 1:i + 3], 16))
                i += 3
                continue
            except ValueError:
                pass
        # metadata strings were UTF-8-decoded from the net file (nn.py),
        # so a literal non-ASCII char stands for its UTF-8 bytes
        out.extend(bytes([ord(c)]) if ord(c) < 128 else c.encode("utf-8"))
        i += 1
    return out.decode("utf-8", errors="replace")


@dataclasses.dataclass
class Metadata:
    """RnnCharMetadata (charmodel.h:74-80)."""
    alphabet: str = ""
    collapse_chars: str = ""
    utf8: bool = False
    collapse_space: bool = False
    case_insensitive: bool = False

    @classmethod
    def from_alphabet(cls, a: Alphabet) -> "Metadata":
        return cls(alphabet=a.points_string(),
                   collapse_chars=a.collapsed_string(),
                   utf8=a.utf8, collapse_space=a.collapse_space,
                   case_insensitive=a.case_insensitive)

    def to_alphabet(self) -> Alphabet:
        return Alphabet.from_chars(self.alphabet, self.collapse_chars,
                                   case_insensitive=self.case_insensitive,
                                   utf8=self.utf8,
                                   collapse_space=self.collapse_space)

    def construct(self) -> str:
        """rnn_char_construct_metadata (charmodel-init.c:532-557)."""
        return ("alphabet %s\ncollapse_chars %s\nutf8 %d\n"
                "collapse_space %d\ncase_insensitive %d\n" % (
                    _urlencode(self.alphabet),
                    _urlencode(self.collapse_chars),
                    int(self.utf8), int(self.collapse_space),
                    int(self.case_insensitive)))

    @classmethod
    def parse(cls, metadata: str) -> "Metadata":
        """rnn_char_load_metadata (charmodel-init.c:559-623)."""
        m = cls()
        lines = metadata.split("\n")
        kv = {}
        for ln in lines:
            if " " in ln:
                k, v = ln.split(" ", 1)
                kv[k] = v
        try:
            m.alphabet = _urldecode(kv["alphabet"])
            m.collapse_chars = _urldecode(kv["collapse_chars"])
            m.utf8 = bool(int(kv["utf8"]))
            m.collapse_space = bool(int(kv["collapse_space"]))
            m.case_insensitive = bool(int(kv["case_insensitive"]))
        except (KeyError, ValueError) as e:
            raise ValueError(f"bad metadata: {e}") from e
        return m


def construct_net_filename(m: Metadata, basename: str, input_size: int,
                           bottom_size: int, hidden_size: int,
                           output_size: int) -> str:
    """rnn_char_construct_net_filename (charmodel-init.c:647-664)."""
    sig = rnn_hash32(m.construct())
    if bottom_size:
        return (f"{basename}-s{sig:x}-i{input_size}-b{bottom_size}"
                f"-h{hidden_size}-o{output_size}.net")
    return f"{basename}-s{sig:x}-i{input_size}-h{hidden_size}-o{output_size}.net"


def check_metadata(net_metadata: Optional[str], m: Metadata,
                   trust_file_metadata: bool = False,
                   force_metadata: bool = False) -> tuple[Metadata, Optional[str]]:
    """rnn_char_check_metadata (charmodel-init.c:666-711): reconcile the
    metadata in a loaded net with the requested one.  Returns the metadata to
    use and (possibly updated) net metadata string."""
    want = m.construct()
    if net_metadata and net_metadata != want:
        if trust_file_metadata:
            try:
                return Metadata.parse(net_metadata), net_metadata
            except ValueError:
                return m, net_metadata
        if force_metadata:
            return m, want
        raise ValueError("metadata mismatch between net file and request "
                         "(use trust_file_metadata or force_metadata)")
    return m, want if not net_metadata else net_metadata


def dump_collapsed_text(symbols, path: str, alphabet: "Alphabet"):
    """rnn_char_dump_collapsed_text (charmodel-init.c:429-440): write encoded
    symbols back out as readable text."""
    with open(path, "w") as f:
        f.write(alphabet.decode(symbols))
