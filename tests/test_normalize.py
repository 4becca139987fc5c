"""Differential test: our one-pass normalizer vs the reference's
replace-cascade (/root/reference/src/normalize_text.py), run on the
reference source directly as the oracle."""

import random
import sys

sys.path.insert(0, "/root/reference")
from src.normalize_text import normalize as ref_norm  # noqa: E402

from czechtriever_tpu.data.normalize_text import normalize as our_norm  # noqa: E402

SAMPLES = [
    "abcd efgh",
    "x‐y−z－w ­ soft",
    "“hello” ‘tis ’ ＇q＇ `a´",
    "5′ 10″ tri‴ quad⁗ rev‵‶‷",
    "a…b  . . .  c ⁄ d ∕ e",
    "plain ascii stays - / ' \" ...",
    "č š ž Czech diacritics unchanged é ü",
    " . . . ",
    "ctrlmixend",
    "՚Ꞌꞌ apostrophes ‚‛ „‟",
    "dashes ‑⁃‒–—― minus ⁻",
]


def test_matches_reference_on_samples():
    for s in SAMPLES:
        assert our_norm(s) == ref_norm(s), repr(s)


def test_matches_reference_fuzz():
    special = list("\u2010\u2011\u2043\u2012\u2013\u2014\u2015\u2212\uff0d\u207b\u201c\u201d\u201e\u201f\u2018\u2019\u201a\u201b\u055a\ua78b\ua78c\uff07\u0060\u00b4\u2032\u2033\u2034\u2035\u2036\u2037\u2057\u2026\u2044\u2215\u00ad")
    special += [chr(c) for c in range(0x01, 0x20)] + ["\u0085"]
    rng = random.Random(0)
    alphabet = special + list("ab c.'\"/-čš")
    for _ in range(200):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        assert our_norm(s) == ref_norm(s), repr(s)
