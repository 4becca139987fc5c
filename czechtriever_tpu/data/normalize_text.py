"""Unicode text canonicalization.

Behavioral parity with the reference normalizer
(/root/reference/src/normalize_text.py:133-162, itself adapted from
chemdataextractor): strip control chars, unify hyphen/minus variants to
'-', quote/apostrophe/accent variants to "'", double-quote variants to
'"', expand primes, collapse ellipsis, unify slashes. Implemented as a
single precomputed ``str.translate`` table plus one multi-char
replacement — one pass over the string instead of the reference's ~40
sequential ``str.replace`` scans.
"""

from __future__ import annotations

# control characters dropped outright (src/normalize_text.py:30-33), plus
# the soft hyphen (:140)
_DELETE = ([chr(c) for c in range(0x01, 0x09)]
           + ["", ""]
           + [chr(c) for c in range(0x11, 0x1C)]
           + ["­"])

# replaced with a space (:136)
_TO_SPACE = ["", "", ""]

# hyphen + minus variants -> '-' (:138-139, sets at :39-56)
_TO_HYPHEN = ["‐", "‑", "⁃", "‒", "–", "—",
              "―", "−", "－", "⁻"]

# double-quote variants -> '"' (:142-143)
_TO_DQUOTE = ["“", "”", "„", "‟"]

# single-quote / apostrophe / accent variants -> "'" (:144-145)
_TO_SQUOTE = ["‘", "’", "‚", "‛", "՚", "Ꞌ",
              "ꞌ", "＇", "`", "´"]

# slash variants -> '/' (:156-157)
_TO_SLASH = ["⁄", "∕"]

_TABLE: dict = {}
for _c in _DELETE:
    _TABLE[ord(_c)] = None
for _c in _TO_SPACE:
    _TABLE[ord(_c)] = " "
for _c in _TO_HYPHEN:
    _TABLE[ord(_c)] = "-"
for _c in _TO_DQUOTE:
    _TABLE[ord(_c)] = '"'
for _c in _TO_SQUOTE:
    _TABLE[ord(_c)] = "'"
for _c in _TO_SLASH:
    _TABLE[ord(_c)] = "/"
# primes expand to runs of apostrophes (:146-152)
_TABLE[ord("′")] = "'"
_TABLE[ord("‵")] = "'"
_TABLE[ord("″")] = "''"
_TABLE[ord("‶")] = "''"
_TABLE[ord("‴")] = "'''"
_TABLE[ord("‷")] = "'''"
_TABLE[ord("⁗")] = "''''"
# ellipsis (:154)
_TABLE[ord("…")] = "..."


def normalize(text: str) -> str:
    """Canonicalize unicode punctuation variants (see module docstring)."""
    text = text.translate(_TABLE)
    return text.replace(" . . . ", " ... ")
