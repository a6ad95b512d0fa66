"""Table-driven alphabet discovery against the reference's own golden values
(test/test_charmodel_alphabet.c) over the shipped corpora.

The reference compares alphabets as SETS (order-independent) plus the
identity of points[0] (the collapse representative)."""

import os

import pytest

from recur_tpu.models.alphabet import Alphabet

EREWHON = "/root/reference/test-images/erewhon.txt"
WAI_NFC = "/root/reference/test-images/Wai1874NgaM-nfc.txt"
WAI_NFD = "/root/reference/test-images/Wai1874NgaM-nfd.txt"

pytestmark = pytest.mark.skipif(not os.path.exists(EREWHON),
                                reason="reference corpora missing")

# (filename, threshold, digit_adjust, alpha_adjust, ignore_case, utf8,
#  collapse_space, expected_alphabet, expected_collapse, first_char)
CASES = [
    (EREWHON, 3e-4, 1.0, 1.0, 1, 0, 1,
     "z etaonihsrdlucmwfygpb,v.k-;x\"qj'?:",
     ")(_1!0*872&{}695/34[]@", "z"),
    (EREWHON, 1e-4, 1.0, 1.0, 1, 0, 1,
     "1etaonihsrdlucmwfygpb,v.k-;x\"qj'?:z)(_ ",
     "!0*872&{}695/34[]@", "1"),
    (EREWHON, 3e-5, 1.0, 1.0, 1, 0, 1,
     " etaonihsrdlucmwfygpb,v.k-;x\"qj'?:z)(_1!0*872&{",
     "}695/34[]@", "{"),
    (EREWHON, 3e-5, 0.3, 1.0, 1, 0, 1,
     "1 etaonihsrdlucmwfygpb,v.k-;x\"qj'?:z)(_!*&",
     "{}0872695/34[]@", "{"),
    (EREWHON, 0.1, 1.0, 1.0, 1, 0, 1,
     "t e", "aonihsrdlucmwfygpb,v.k-;x\"qj'?:z)(_1!0*872&}{695/34][@", "t"),
    (EREWHON, 1e-7, 1.0, 1.0, 1, 0, 1,
     " !\"&'()*,-./0123456789:;?@[]_abcdefghijklmnopqrstuvwxyz{}",
     "", None),
    (EREWHON, 1e-4, 1.0, 1.0, 0, 0, 1,
     "1 etaonhisrdlucmwfygpb,v.Ik-;Tx\"EAqjH'MSWN?C:BOP()zRFY_LDG",
     "!UX0*VQ87ZK2J&}{695/34][@", "1"),
    (EREWHON, 1e-4, 1.0, 1.0, 1, 0, 0,
     "1etaonihsrdlucmwfygpb,v.k-;x\"qj'?:z)(_ \n\r",
     "!0*872&{}695/34[]@", "1"),
    # utf-8 treatment of pure ASCII text — same result
    (EREWHON, 1e-4, 1.0, 1.0, 1, 1, 1,
     "1etaonihsrdlucmwfygpb,v.k-;x\"qj'?:z)(_ ",
     "!0*872&{}695/34[]@", "1"),
    # Māori text, NFD (decomposed: combining macron U+0304)
    (WAI_NFD, 1e-4, 1.0, 1.0, 1, 1, 1,
     "' aiteokhrnu.mgpw<>,1-0£sd42₤367859:)(;—v\"c&bj*/l̄",
     "…yẍ", "'"),
    # NFC, case sensitive
    (WAI_NFC, 1e-4, 1.0, 1.0, 0, 1, 1,
     "' aietoknrh.ugmp<>Kw,1MTH-W0RPN£sd42A₤36I785OE9:)(;ā—\"vUVcB&JlS*/ē",
     "yD…xüXōCGī", "'"),
    # NFC, preserve whitespace
    (WAI_NFC, 1e-4, 1.0, 1.0, 1, 1, 0,
     "'\n\r \"&()*,-./0123456789:;<>abcdeghijklmnoprstuvw£āē—₤",
     "xyüīō…", "'"),
]


@pytest.mark.parametrize("case", CASES,
                         ids=[f"{os.path.basename(c[0])}-t{c[1]}-d{c[2]}"
                              f"-a{c[3]}-i{c[4]}-u{c[5]}-s{c[6]}"
                              for c in CASES])
def test_alphabet_golden(case):
    (path, threshold, digit_adjust, alpha_adjust, ignore_case, utf8,
     collapse_space, want_alpha, want_collapse, first) = case
    with open(path, "rb") as f:
        text = f.read()
    a = Alphabet.find(text, threshold=threshold, digit_adjust=digit_adjust,
                      alpha_adjust=alpha_adjust,
                      case_insensitive=bool(ignore_case), utf8=bool(utf8),
                      collapse_space=bool(collapse_space))
    got_alpha = set(a.points_string())
    got_collapse = set(a.collapsed_string())
    assert got_alpha == set(want_alpha), (
        f"alphabet diff: extra {got_alpha - set(want_alpha)!r}, "
        f"missing {set(want_alpha) - got_alpha!r}")
    assert got_collapse == set(want_collapse), (
        f"collapse diff: extra {got_collapse - set(want_collapse)!r}, "
        f"missing {set(want_collapse) - got_collapse!r}")
    # NB: the reference test's own first_char check is disabled
    # (test_charmodel_alphabet.c: `if (0 && a->first_char ...)`), and its
    # recorded values are inconsistent — the set comparison above is the
    # real contract.
    del first
