"""Pure-Python oracle for the reference pipeline's text semantics.

Reimplemented from the behaviors documented in SURVEY.md §2A (cites
into /root/reference/index_documents.py) — NOT copied; used only by
tests to golden-check the Spark column expressions.
"""

from __future__ import annotations

import re


def clean_text(text: str) -> str:
    # index_documents.py:58-63
    out = text.replace(" ", " ")
    out = re.sub(r"[ \t]+", " ", out)
    out = re.sub(r"\n{3,}", "\n\n", out)
    return out.strip()


def split_paragraphs(text: str) -> list[str]:
    # index_documents.py:69-70
    return [p.strip() for p in re.split(r"\n\s*\n", text) if p.strip()]


def split_sentences(text: str) -> list[str]:
    # index_documents.py:72-77
    parts = re.split(r"(?<=[.!?])\s+", text.strip())
    return [s.strip() for s in parts if s.strip()]


def fixed_windows(text: str, chunk_size: int, overlap: int) -> list[str]:
    # index_documents.py:79-103: character windows with stride
    # chunk_size-overlap, strip each, drop empties, stop at the first
    # window that reaches the end.
    assert chunk_size > 0 and 0 <= overlap < chunk_size
    out: list[str] = []
    pos = 0
    while pos < len(text):
        end = min(pos + chunk_size, len(text))
        piece = text[pos:end].strip()
        if piece:
            out.append(piece)
        if end == len(text):
            break
        pos = end - overlap
    return out


def group_sentences(sentences: list[str], chunk_size: int) -> list[str]:
    # index_documents.py:110-129, including the bookkeeping quirk: every
    # append adds len(s)+1 (:125) but a flush resets to len(s) (:122),
    # so the first buffer carries a phantom +1.
    target = max(200, chunk_size)
    groups: list[str] = []
    buf: list[str] = []
    buf_len = 0
    for s in sentences:
        if buf and (buf_len + len(s) + 1 > target):
            groups.append(" ".join(buf).strip())
            buf = [s]
            buf_len = len(s)
        else:
            buf.append(s)
            buf_len += len(s) + 1
    if buf:
        groups.append(" ".join(buf).strip())
    return groups


def split_to_chunks(
    text: str, strategy: str, chunk_size: int = 1200, overlap: int = 200
) -> list[str]:
    # index_documents.py:106-134
    if strategy == "paragraph":
        return split_paragraphs(text)
    if strategy == "sentence":
        return group_sentences(split_sentences(text), chunk_size)
    if strategy == "fixed":
        return fixed_windows(text, chunk_size, overlap)
    raise ValueError(f"Unknown strategy: {strategy}")
