"""Minimal pure-stdlib PDF text extraction (and a tiny writer for
round-trip tests) — the vendored extractor behind the parse seam, so the
prebuilt-read route (BlobTriggerFunction.cs:90-98's Document Intelligence
call; the repo's ``analyze_with_client`` seam) runs REAL document bytes
in every test run instead of an optional-skip behind pypdf.

Scope (documented, honest): digital PDFs whose content streams are plain
or FlateDecode (zlib — stdlib), text shown with the standard operators —
``Tj`` / ``TJ`` / ``'`` / ``"`` over literal ``(...)`` (with escapes and
nested parens) or hex ``<...>`` strings — and line structure from the
text-positioning operators ``Td`` / ``TD`` / ``T*``.  That is the PDF
1.4+ subset every "hello world through LaTeX-simple" digital document
uses; scanned/image PDFs and CID-keyed fonts need a real OCR/layout
client dropped into the same seam (the stub-philosophy boundary).

Everything here derives from the public PDF 1.7 specification
(ISO 32000-1); no third-party code.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["extract_pdf_text", "build_simple_pdf", "pdf_analysis_client"]

_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_START_RE = re.compile(rb"stream\r?\n")
_ENDSTREAM_RE = re.compile(rb"\r?\n?endstream")
_LEN_INDIRECT_RE = re.compile(rb"/Length\s+(\d+)\s+\d+\s+R")
_LEN_DIRECT_RE = re.compile(rb"/Length\s+(\d+)\b(?!\s+\d+\s+R)")
_REF_RE = re.compile(rb"/Contents\s+(?:(\d+)\s+\d+\s+R|\[(.*?)\])", re.S)
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.S)
_NUM_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")

_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


def _resolve_length(header: bytes, data: bytes) -> int | None:
    """The stream's byte length from the header dict: a direct integer,
    or an indirect ``N G R`` reference resolved against a bare integer
    object anywhere in the file (indirect /Length objects conventionally
    follow their stream, ISO 32000-1 §7.3.8.2)."""
    lm = _LEN_DIRECT_RE.search(header)
    if lm is not None:
        return int(lm.group(1))
    lm = _LEN_INDIRECT_RE.search(header)
    if lm is not None:
        ref = int(lm.group(1))
        rm = re.search(rb"(?<![0-9])%d\s+\d+\s+obj\s*(\d+)\s*endobj" % ref, data)
        if rm is not None:
            return int(rm.group(1))
    return None


def _parse_objects(data: bytes) -> dict:
    """{obj_num: (header_dict_bytes, stream_bytes_or_None)} — streams
    Flate-decoded when the header declares the filter.

    Streams are sliced by the header's /Length (so FlateDecode bytes that
    happen to contain ``endstream``/``endobj`` sequences survive intact);
    the scan resumes after each sliced stream, and an ``endstream``
    keyword search is the fallback only when /Length is absent,
    unresolvable, or yields undecodable bytes."""
    objs = {}
    pos = 0
    while True:
        m = _OBJ_HEAD_RE.search(data, pos)
        if m is None:
            break
        num = int(m.group(1))
        body_start = m.end()
        sm = _STREAM_START_RE.search(data, body_start)
        em = data.find(b"endobj", body_start)
        if sm is None or (em != -1 and em < sm.start()):
            header = data[body_start:em] if em != -1 else data[body_start:]
            objs[num] = (header, None)
            pos = em + 6 if em != -1 else len(data)
            continue
        header = data[body_start:sm.start()]
        stream_start = sm.end()
        length = _resolve_length(header, data)
        stream = None
        if length is not None and stream_start + length <= len(data):
            stream = data[stream_start:stream_start + length]
            if b"/FlateDecode" in header:
                try:
                    stream = zlib.decompress(stream)
                except zlib.error:
                    stream = None  # bad /Length — fall through to keyword scan
        if stream is None:
            esm = _ENDSTREAM_RE.search(data, stream_start)
            stream_end = esm.start() if esm is not None else len(data)
            stream = data[stream_start:stream_end]
            if b"/FlateDecode" in header:
                try:
                    stream = zlib.decompress(stream)
                except zlib.error as exc:
                    # no /Length AND keyword-truncated Flate bytes:
                    # nothing left to try — degrade like any other
                    # unparseable input (ValueError is the seam's
                    # fall-back-to-raw-content signal), never a raw
                    # zlib.error out of an Arrow task
                    raise ValueError(
                        "undecodable FlateDecode stream (missing or "
                        "unresolvable /Length and keyword scan "
                        f"truncated the data): {exc}") from exc
            length = stream_end - stream_start
        pos = data.find(b"endobj", stream_start + length)
        pos = pos + 6 if pos != -1 else stream_start + length
        objs[num] = (header, stream)
    return objs


def _page_order(objs: dict) -> list[int]:
    """Document-order page object numbers: walk the page tree's /Kids
    recursively; fall back to object-number order of /Type /Page."""
    pages_nodes = {n for n, (h, _) in objs.items()
                   if b"/Type" in h and b"/Pages" in h}
    leaf = [n for n, (h, _) in objs.items()
            if re.search(rb"/Type\s*/Page\b(?!s)", h)]
    roots = [n for n in pages_nodes
             if not any(n in _kids(objs[p][0]) for p in pages_nodes
                        if p != n)]
    order: list[int] = []

    def walk(n: int) -> None:
        if n in pages_nodes:
            for k in _kids(objs[n][0]):
                if k in objs:
                    walk(k)
        elif n in leaf and n not in order:
            order.append(n)

    for r in roots:
        walk(r)
    for n in sorted(leaf):              # orphans (broken tree): append
        if n not in order:
            order.append(n)
    return order


def _kids(header: bytes) -> list[int]:
    m = _KIDS_RE.search(header)
    if not m:
        return []
    return [int(x.group(1)) for x in _NUM_REF_RE.finditer(m.group(1))]


def _content_streams(objs: dict, page: int) -> list[bytes]:
    m = _REF_RE.search(objs[page][0])
    if not m:
        return []
    refs = ([int(m.group(1))] if m.group(1) is not None
            else [int(x.group(1))
                  for x in _NUM_REF_RE.finditer(m.group(2))])
    return [objs[r][1] for r in refs
            if r in objs and objs[r][1] is not None]


def _pdf_string(tok: bytes) -> str:
    """Decode one literal () or hex <> PDF string token (delimiters
    included) to text — escapes, octal codes, nested parens already
    balanced by the tokenizer."""
    if tok[:1] == b"<":
        h = re.sub(rb"\s", b"", tok[1:-1])
        if len(h) % 2:
            h += b"0"
        return bytes.fromhex(h.decode("ascii")).decode("latin-1")
    body, out, i = tok[1:-1], bytearray(), 0
    while i < len(body):
        c = body[i:i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            om = re.match(rb"[0-7]{1,3}", body[i + 1:i + 4])
            if om:
                out.append(int(om.group(0), 8) & 0xFF)
                i += 1 + len(om.group(0))
                continue
            i += 1                       # line continuation / unknown
            continue
        out += c
        i += 1
    return out.decode("latin-1")


_TOKEN_RE = re.compile(
    rb"(\((?:[^()\\]|\\.|\([^()]*\))*\))"   # literal string (1 nest deep)
    rb"|(<[0-9A-Fa-f\s]*>)"                 # hex string
    rb"|(\[[^\]]*\])"                       # array (TJ operand)
    rb"|(T\*|T[jJdD]|'|\")",                # the text operators we track
    re.S)


def _extract_stream_text(stream: bytes) -> list[str]:
    """Line-structured text of one content stream: string-showing
    operators append to the current line; Td/TD/T*/'/\" start a new
    one (the same coarse line model a prebuilt-read response's
    ``lines`` carries)."""
    lines: list[str] = []
    cur: list[str] = []
    pend: list[str] = []                 # operand stack of string tokens

    def newline() -> None:
        if cur:
            lines.append("".join(cur))
            cur.clear()

    for m in _TOKEN_RE.finditer(stream):
        lit, hx, arr, op = m.group(1), m.group(2), m.group(3), m.group(4)
        if lit is not None or hx is not None:
            pend.append(_pdf_string(lit if lit is not None else hx))
        elif arr is not None:
            pend.append("".join(
                _pdf_string(t.group(1) or t.group(2))
                for t in re.finditer(
                    rb"(\((?:[^()\\]|\\.)*\))|(<[0-9A-Fa-f\s]*>)", arr)))
        elif op in (b"Tj", b"TJ"):
            if pend:
                cur.append(pend[-1])
            pend.clear()
        elif op in (b"'", b'"'):
            newline()
            if pend:
                cur.append(pend[-1])
            pend.clear()
        elif op in (b"Td", b"TD", b"T*"):
            newline()
            pend.clear()
    newline()
    return [ln for ln in lines if ln.strip()]


def extract_pdf_text(data: bytes) -> list[str]:
    """Per-page text (lines joined with newlines), document page
    order.  Raises ValueError on bytes that are not a PDF at all."""
    if not data.lstrip()[:5].startswith(b"%PDF-"):
        raise ValueError("not a PDF: missing %PDF- header")
    objs = _parse_objects(data)
    pages = []
    for p in _page_order(objs):
        lines: list[str] = []
        for s in _content_streams(objs, p):
            lines.extend(_extract_stream_text(s))
        pages.append("\n".join(lines))
    return pages


def build_simple_pdf(pages: list[list[str]],
                     compress: bool = False) -> bytes:
    """A tiny valid PDF writer (Helvetica, one Td+Tj per line) for
    round-trip tests — deterministic bytes for deterministic inputs."""
    objs: list[bytes] = []

    def esc(s: str) -> bytes:
        return (s.replace("\\", r"\\").replace("(", r"\(")
                 .replace(")", r"\)").encode("latin-1"))

    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    kids = b" ".join(b"%d 0 R" % (3 + 2 * i) for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [" + kids
                + b"] /Count %d >>" % n_pages)
    for i, lines in enumerate(pages):
        page_num, cont_num = 3 + 2 * i, 4 + 2 * i
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents %d 0 R /Resources << /Font << /F1 %d 0 R >> >> >>"
            % (cont_num, font_num))
        body = b"BT /F1 12 Tf 72 720 Td\n" + b"\n".join(
            b"(" + esc(ln) + b") Tj 0 -14 Td" for ln in lines) + b"\nET"
        if compress:
            comp = zlib.compress(body)
            objs.append(b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
                        % len(comp) + comp + b"\nendstream")
        else:
            objs.append(b"<< /Length %d >>\nstream\n" % len(body)
                        + body + b"\nendstream")
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, o in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF"
            % (len(objs) + 1, xref_at))
    return bytes(out)


def pdf_analysis_client(payloads: list) -> list:
    """The parse-seam client (``analyze_with_client`` contract — the
    prebuilt-read response shape: lines → paragraphs → words →
    content) over real PDF bytes via the vendored extractor.  Accepts
    bytes or latin-1 str payloads; self-contained (stdlib only), so it
    cloudpickles by value like every house client."""
    from document_vector_pipeline_spark.functions.minipdf import (
        extract_pdf_text,
    )

    out = []
    for p in payloads:
        data = p if isinstance(p, (bytes, bytearray)) \
            else (p or "").encode("latin-1")
        try:
            pages = extract_pdf_text(bytes(data))
        except ValueError:
            # not a PDF / undecodable stream: degrade to the cascade's
            # last rung — raw bytes as content, no structure (the
            # prebuilt-read fallback order ends at `content`)
            out.append({"lines": [], "paragraphs": [], "words": [],
                        "content": bytes(data).decode("latin-1")})
            continue
        lines = [ln for pg in pages for ln in pg.splitlines()
                 if ln.strip()]
        out.append({"lines": lines,
                    "paragraphs": [pg for pg in pages if pg.strip()],
                    "words": [w for ln in lines for w in ln.split()],
                    "content": "\n".join(pages)})
    return out
