"""Standard tokenizer: UAX#29 word-break segmentation (Lucene-style).

Lucene's ``StandardTokenizer`` (the tokenizer of both default text types in
the reference configset) implements the Unicode UAX#29 word-break rules with
a default ``maxTokenLength`` of 255; over-long runs are emitted in 255-char
chunks. Implemented here from the public UAX#29 spec as a regex that covers
the rules relevant to source code and western text:

- runs of word characters (letters, digits, underscore — underscore is
  ExtendNumLet, which joins: ``foo_bar`` is ONE token; UAX#29 WB13a/b);
- MidLetter apostrophe between letters: ``don't`` is one token; a trailing
  apostrophe is not kept (``dogs'`` -> ``dogs``);
- MidNum ``.``/``,`` between digits: ``3.14`` and ``1,000`` are single
  tokens; ``a.b`` splits;
- everything else (punctuation, symbols, whitespace) is a break:
  ``C++`` -> ``c``.

Full-script fidelity (CJK, complex scripts) is out of scope for the
source-code corpus; the regex uses Unicode ``\\w`` so Latin/Greek/Cyrillic
identifiers tokenize correctly.
"""

from __future__ import annotations

import re

MAX_TOKEN_LENGTH = 255

# \w+ gives the base run (letters+digits+underscore, Unicode-aware).
# The two optional join groups implement MidLetter apostrophe (letter on both
# sides) and MidNum period/comma (digit on both sides).
_TOKEN_RE = re.compile(
    r"\w+(?:(?:['’](?=[^\W\d_]))|(?:[.,](?=\d)))*"
    r"(?:['’][^\W\d_]\w*|[.,]\d\w*)*",
    re.UNICODE,
)

# Simpler equivalent form used for matching: a word run, extended by
# (apostrophe + letter-run) or (./, + digit-run) joins.
_TOKEN_RE = re.compile(
    r"\w+(?:['’](?=[^\W\d_])\w+|[.,](?=\d)\w+)*",
    re.UNICODE,
)


def standard_tokenize(text: str, max_token_length: int = MAX_TOKEN_LENGTH) -> list[str]:
    """Segment ``text`` into UAX#29-style word tokens (original case kept)."""
    if not text:
        return []
    out: list[str] = []
    for m in _TOKEN_RE.finditer(text):
        tok = m.group(0)
        if len(tok) <= max_token_length:
            out.append(tok)
        else:
            # Lucene splits over-long runs into maxTokenLength chunks.
            out.extend(
                tok[i : i + max_token_length]
                for i in range(0, len(tok), max_token_length)
            )
    return out
