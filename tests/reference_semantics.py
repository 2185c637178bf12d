"""Pure-Python replication of the reference chunkers' semantics, used as
the expected-value oracle in unit tests.

These are transcriptions of the BEHAVIOR of:
- AzureSQL/.../TextChunker.cs:15-50  (char windows, page tracking)
- AzureCosmosDB/.../DocumentChunker.cs:84-113  (SplitWords, 40-word windows)
plus our documented token-budget spec (functions/chunking.py).
"""

from __future__ import annotations


def char_window_reference(words: list[str], chunk_size: int = 2048):
    """(text, page) chunks per AzureSQL TextChunker.FixedSizeChunking with a
    single page of words."""
    out = []
    sb = ""
    for w in words:
        sb += w + " "
        if len(sb) > chunk_size:
            out.append((sb[:-1], 0))
            sb = ""
    if len(sb) > 1:
        out.append((sb[:-1], 1))  # post-loop pageIndex == page count (1)
    return out


def word_window_reference(words: list[str], max_word_count: int = 40):
    """Chunks per DocumentChunker.SplitWords: emit when count EXCEEDS max."""
    out = []
    buf: list[str] = []
    for w in words:
        buf.append(w)
        if len(buf) > max_word_count:
            out.append(" ".join(buf))
            buf = []
    if buf:
        out.append(" ".join(buf))
    return out


def sk_paragraph_reference(text: str, max_tokens: int = 250):
    """(text, page) chunks per the SK SplitPlainTextParagraphs spec of
    functions/chunking.py token_paragraph_chunks: per-line word packing
    (budget 4*max_tokens+3 joined chars), greedy paragraph build joined
    with newline (emit when tokens(para+'\\n') + tokens(piece) >= max,
    tokens = len//4), then last-paragraph balancing (short tail whose word
    count fits merges into the predecessor, rejoined with spaces)."""
    pieces: list[str] = []
    for line in text.split("\n"):
        for piece in token_budget_reference(line.split(), max_tokens):
            pieces.append(piece)
    paras: list[str] = []
    cur = ""
    for p in pieces:
        if cur and (len(cur) + 1) // 4 + len(p) // 4 >= max_tokens:
            paras.append(cur)
            cur = p
        elif cur:
            cur = cur + "\n" + p
        else:
            cur = p
    if cur:
        paras.append(cur)
    if len(paras) >= 2:
        lw, sw = paras[-1].split(), paras[-2].split()
        if (len(paras[-1]) // 4 < max_tokens // 4
                and len(lw) + len(sw) <= max_tokens):
            paras[-2:] = [" ".join(sw) + " " + " ".join(lw)]
    return [(p, 0) for p in paras]


def token_budget_reference(words: list[str], max_tokens: int = 250,
                           overlap_words: int = 0):
    """Greedy packing per our documented spec: budget in joined chars is
    4*max_tokens+3; a word that would overflow starts a new chunk."""
    budget = 4 * max_tokens + 3
    spans: list[tuple[int, int]] = []
    start = 0
    cum = 0
    for i, w in enumerate(words):
        add = len(w) + (1 if cum > 0 else 0)
        if cum + add > budget and cum > 0:
            spans.append((start, i - 1))
            start = i
            cum = len(w)
        else:
            cum += add
    if words:
        spans.append((start, len(words) - 1))
    out = []
    prev_start = None
    for (s, e) in spans:
        s2 = s
        if overlap_words > 0 and prev_start is not None:
            s2 = max(prev_start, s - overlap_words)
        out.append(" ".join(words[s2:e + 1]))
        prev_start = s
    return out
