"""FITS header reading and card parsing.

Parity targets (behavior, not code):
- multi-block header read until END card: reference
  ``FitsLib.scala:513-605`` (``readFullHeaderBlocks`` / END detection
  ``FitsLib.scala:596-599``).
- card → (keyword, value) parsing with the reference's ``=`` +
  ``" /comment"`` semantics: ``FitsLib.scala:93-115`` (``parseHeader``),
  including quoted values that contain ``/`` (fixture
  ``colnames_with_slash.fits``, ``packageTest.scala:256-262``).
- quoted-string unquote + trim: ``FitsLib.scala:152-156``
  (``shortStringValue``).
- comment extraction: ``FitsLib.scala:666-675`` (``getHeaderComments``).
"""

from __future__ import annotations

from typing import BinaryIO

from spark_fits_spark.fitscore.constants import FITS_BLOCK_SIZE, FITS_CARD_SIZE


def read_header(fobj: BinaryIO, offset: int | None = None) -> list[str]:
    """Read full header (possibly spanning multiple 2880-byte blocks)
    starting at ``offset`` (or the current position); return the list of
    80-char card strings up to and including ``END``.

    The file cursor is left at the first data byte (the 2880-aligned
    position after the last header block), mirroring the reference's
    cursor behavior after ``readFullHeaderBlocks``.
    """
    if offset is not None:
        fobj.seek(offset)
    cards: list[str] = []
    while True:
        block = fobj.read(FITS_BLOCK_SIZE)
        if len(block) < FITS_BLOCK_SIZE:
            raise EOFError(
                "Truncated FITS header: EOF before END card "
                f"(got {len(block)} bytes in final block)"
            )
        found_end = False
        for i in range(0, FITS_BLOCK_SIZE, FITS_CARD_SIZE):
            card = block[i : i + FITS_CARD_SIZE].decode("ascii", errors="replace")
            keyword = card[:8].strip()
            if keyword == "END":
                found_end = True
                break
            cards.append(card)
        if found_end:
            return cards


def split_card(card: str) -> tuple[str, str | None, str | None]:
    """Split one 80-char card into (keyword, raw_value, comment).

    Handles quoted string values that contain ``/`` (the comment
    separator only applies outside quotes) — the behavior required by the
    ``colnames_with_slash.fits`` fixture. Returns ``value=None`` for
    commentary cards (COMMENT/HISTORY/blank keyword) and cards without
    ``=`` in column 9-10.
    """
    keyword = card[:8].strip()
    if keyword in ("COMMENT", "HISTORY", "") or card[8:10] != "= ":
        body = card[8:].strip()
        return keyword, None, body if body else None
    rest = card[10:]
    if rest.lstrip().startswith("'"):
        # quoted string: find closing quote, honoring '' escapes
        s = rest.lstrip()
        lead = len(rest) - len(s)
        i = 1
        n = len(s)
        while i < n:
            if s[i] == "'":
                if i + 1 < n and s[i + 1] == "'":
                    i += 2
                    continue
                break
            i += 1
        value = s[: i + 1] if i < n else s
        tail = s[i + 1 :] if i < n else ""
        comment = None
        if "/" in tail:
            comment = tail.split("/", 1)[1].strip() or None
        return keyword, value.strip(), comment
    # unquoted: comment starts at first '/'
    if "/" in rest:
        value, comment = rest.split("/", 1)
        return keyword, value.strip(), comment.strip() or None
    return keyword, rest.strip(), None


def parse_cards(cards: list[str]) -> dict[str, str]:
    """Parse header cards into a keyword → raw-value dict.

    Mirrors the reference's ``parseHeader`` (``FitsLib.scala:110-115``):
    duplicate keywords keep the LAST occurrence — Scala ``toMap`` over
    the card sequence lets later pairs overwrite earlier ones, and a
    plain Python dict assignment reproduces that exactly. String values
    keep their quotes — use :func:`short_string_value` to unquote.
    """
    out: dict[str, str] = {}
    for card in cards:
        keyword, value, _ = split_card(card)
        if value is None or not keyword:
            continue
        out[keyword] = value
    return out


def parse_comments(cards: list[str]) -> dict[str, str]:
    """Keyword → comment map (reference ``FitsLib.scala:666-675``);
    duplicates keep the last occurrence (Scala ``toMap``), like
    :func:`parse_cards`."""
    out: dict[str, str] = {}
    for card in cards:
        keyword, _, comment = split_card(card)
        if keyword and comment is not None:
            out[keyword] = comment
    return out


def short_string_value(raw: str) -> str:
    """Unquote + trim a FITS string value (``FitsLib.scala:152-156``).

    ``'NGC0000001'`` → ``NGC0000001``; non-quoted values are returned
    trimmed. FITS escapes a quote inside a string as ``''``.
    """
    raw = raw.strip()
    if len(raw) >= 2 and raw.startswith("'") and raw.endswith("'"):
        return raw[1:-1].replace("''", "'").strip()
    return raw


def header_value(header: dict[str, str], keyword: str, default: str | None = None) -> str | None:
    """Fetch + unquote a header value."""
    raw = header.get(keyword)
    if raw is None:
        return default
    return short_string_value(raw)
