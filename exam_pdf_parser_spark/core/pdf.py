"""Minimal, dependency-free PDF layout reader + writer.

The reference pipeline ingests REAL PDFs (src/pdf_parser.py:34-50);
this module closes that gap stdlib-only, pdfminer-style (north star:
"pdfminer-style layout analysis"):

* :func:`parse_pdf_pages` — bytes → the engine's standard ``pages``
  layout (``{"page_idx", "page_size", "blocks": [...]}``), so
  ``extract_document`` runs UNCHANGED on PDF payloads.  Implemented:
  full-file object scan (xref-free, tolerant of both classic-xref and
  xref-stream files), object streams (/ObjStm), FlateDecode, the page
  tree, and a content-stream text interpreter (BT/ET, Tf, Td/TD/Tm/T*,
  Tj/TJ/quote ops) with two font paths — simple 1-byte fonts
  (ToUnicode, /Differences, Latin-1 fallback) and composite
  Type0/Identity-H fonts (2-byte CIDs via ToUnicode bfchar/bfrange,
  the encoding real Korean exam PDFs use).
* :func:`build_pdf` — the inverse for tests: the synthetic layout
  rendered as a real PDF (one BT/ET block per layout block, all text
  as Identity-H hex strings with a generated ToUnicode CMap), so the
  round trip PDF→pages→detector is byte-comparable with the native
  layout path.

Out of scope (raise or degrade gracefully, documented): encrypted
PDFs, non-Flate filters (DCT/LZW images do not matter for text),
precise glyph widths (x-extents are estimated from char count × size;
block grouping is per-BT, so text content and reading order — the
byte-identity surface — never depend on the estimate).
"""

from __future__ import annotations

import re
import zlib

# --- object model ---------------------------------------------------------------


class Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):
        return f"Ref({self.num})"


class Name(str):
    """PDF name (distinct from string values)."""


class Stream:
    __slots__ = ("d", "raw")

    def __init__(self, d: dict, raw: bytes):
        self.d = d
        self.raw = raw


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Tokenizer for PDF object syntax (also used for content streams)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d = self.data
        n = len(d)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def peek_bytes(self, k: int) -> bytes:
        return self.data[self.pos:self.pos + k]

    def token(self):
        """Next token: returns python value, Name, bytes (string),
        or one of the sentinel strings '<<' '>>' '[' ']' or an
        operator/keyword string."""
        self._skip_ws()
        d = self.data
        if self.pos >= len(d):
            return None
        c = d[self.pos]
        if c == 0x3C:  # '<'
            if d[self.pos + 1:self.pos + 2] == b"<":
                self.pos += 2
                return "<<"
            return self._hex_string()
        if c == 0x3E:  # '>>'
            self.pos += 2
            return ">>"
        if c == 0x5B:
            self.pos += 1
            return "["
        if c == 0x5D:
            self.pos += 1
            return "]"
        if c == 0x28:
            return self._literal_string()
        if c == 0x2F:
            return self._name()
        if c in b"+-.0123456789":
            return self._number()
        # keyword / operator
        start = self.pos
        while self.pos < len(d) and d[self.pos] not in _WS \
                and d[self.pos] not in _DELIM:
            self.pos += 1
        if self.pos == start:
            # stray delimiter (')', '{', '}', …): consume ONE byte so
            # the caller always advances — a zero-length token here
            # spins every caller loop forever (found by fuzz)
            self.pos += 1
            return d[start:self.pos].decode("latin-1")
        return d[start:self.pos].decode("latin-1")

    def _name(self) -> Name:
        d = self.data
        self.pos += 1
        start = self.pos
        out = []
        while self.pos < len(d) and d[self.pos] not in _WS \
                and d[self.pos] not in _DELIM:
            if d[self.pos] == 0x23 and self.pos + 2 < len(d):  # #xx
                out.append(d[start:self.pos])
                out.append(bytes([int(d[self.pos + 1:self.pos + 3], 16)]))
                self.pos += 3
                start = self.pos
            else:
                self.pos += 1
        out.append(d[start:self.pos])
        return Name(b"".join(out).decode("latin-1"))

    def _number(self):
        d = self.data
        start = self.pos
        while self.pos < len(d) and d[self.pos] in b"+-.0123456789":
            self.pos += 1
        s = d[start:self.pos]
        return float(s) if b"." in s else int(s)

    def _hex_string(self) -> bytes:
        d = self.data
        self.pos += 1
        end = d.index(b">", self.pos)
        hx = re.sub(rb"\s", b"", d[self.pos:end])
        self.pos = end + 1
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii"))

    def _literal_string(self) -> bytes:
        d = self.data
        self.pos += 1
        out = bytearray()
        depth = 1
        while self.pos < len(d):
            c = d[self.pos]
            if c == 0x5C:  # backslash
                nxt = d[self.pos + 1]
                esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12,
                       0x28: 40, 0x29: 41, 0x5C: 92}
                if nxt in esc:
                    out.append(esc[nxt])
                    self.pos += 2
                elif 0x30 <= nxt <= 0x37:  # octal
                    oct_s = d[self.pos + 1:self.pos + 4]
                    m = re.match(rb"[0-7]{1,3}", oct_s)
                    out.append(int(m.group(0), 8) & 0xFF)
                    self.pos += 1 + len(m.group(0))
                elif nxt in b"\r\n":       # line continuation
                    self.pos += 2
                    if nxt == 0x0D and d[self.pos:self.pos + 1] == b"\n":
                        self.pos += 1
                else:
                    out.append(nxt)
                    self.pos += 2
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return bytes(out)
            out.append(c)
            self.pos += 1
        return bytes(out)

    def value(self, tok=None):
        """Parse a full object starting at ``tok`` (or the next token).
        Detects ``n g R`` references by lookahead."""
        if tok is None:
            tok = self.token()
        if tok == "<<":
            d = {}
            while True:
                k = self.token()
                if k == ">>" or k is None:
                    return d
                d[str(k)] = self.value()
        if tok == "[":
            arr = []
            while True:
                save = self.pos
                t = self.token()
                if t == "]" or t is None:
                    return arr
                self.pos = save
                arr.append(self.value())
        if isinstance(tok, int):
            save = self.pos
            t2 = self.token()
            if isinstance(t2, int):
                t3 = self.token()
                if t3 == "R":
                    return Ref(tok)
            self.pos = save
            return tok
        if tok == "true":
            return True
        if tok == "false":
            return False
        if tok == "null":
            return None
        return tok


# --- document ---------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


class PdfDocument:
    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF-"):
            raise ValueError("not a PDF payload")
        if b"/Encrypt" in data[-2048:]:
            raise ValueError("encrypted PDF not supported")
        self.data = data
        self.objs: dict[int, object] = {}
        self._scan()
        self._expand_objstm()

    def _scan(self) -> None:
        self._off: dict[int, int] = {}
        skip_until = 0
        for m in _OBJ_RE.finditer(self.data):
            if m.start() < skip_until:
                continue            # match INSIDE a stream body (binary
            num = int(m.group(1))   # data can contain 'N M obj' bytes)
            lex = _Lexer(self.data, m.end())
            val = lex.value()
            if isinstance(val, dict):
                lex._skip_ws()
                if lex.peek_bytes(6) == b"stream":
                    p = lex.pos + 6
                    if self.data[p:p + 2] == b"\r\n":
                        p += 2
                    elif self.data[p:p + 1] in (b"\n", b"\r"):
                        p += 1
                    length = self.resolve(val.get("Length"))
                    if not isinstance(length, int):
                        # tolerate broken Length: scan for endstream
                        end = self.data.index(b"endstream", p)
                        length = end - p
                    val = Stream(val, self.data[p:p + length])
                    skip_until = p + length
            # later definitions win (incremental updates append)
            self.objs[num] = val
            self._off[num] = m.start()

    def _expand_objstm(self) -> None:
        for num in list(self.objs):
            o = self.objs[num]
            if isinstance(o, Stream) and o.d.get("Type") == Name("ObjStm"):
                data = self.stream_data(o)
                n = self.resolve(o.d["N"])
                first = self.resolve(o.d["First"])
                container_off = self._off.get(num, 0)
                head = _Lexer(data)
                pairs = [(head.token(), head.token()) for _ in range(n)]
                for onum, off in pairs:
                    onum = int(onum)
                    # same latest-wins rule as the top-level scan: a
                    # contained object takes its CONTAINER's file
                    # offset, so an incremental update appending a new
                    # ObjStm overrides earlier definitions
                    if container_off >= self._off.get(onum, -1):
                        lex = _Lexer(data, first + off)
                        self.objs[onum] = lex.value()
                        self._off[onum] = container_off

    def resolve(self, v, depth: int = 0):
        while isinstance(v, Ref) and depth < 32:
            v = self.objs.get(v.num)
            depth += 1
        return v

    def stream_data(self, s: Stream) -> bytes:
        filt = self.resolve(s.d.get("Filter"))
        data = s.raw
        filters = ([filt] if not isinstance(filt, list) else filt)
        for f in filters:
            f = self.resolve(f)
            if f is None:
                continue
            if f == Name("FlateDecode"):
                data = zlib.decompress(data)
                parms = self.resolve(s.d.get("DecodeParms"))
                if isinstance(parms, dict) and self.resolve(
                        parms.get("Predictor"), 0) not in (None, 1):
                    data = _png_predictor(
                        data,
                        int(self.resolve(parms.get("Columns")) or 1),
                        int(self.resolve(parms.get("Colors")) or 1))
            else:
                raise ValueError(f"unsupported stream filter {f}")
        return data

    # --- page tree ---------------------------------------------------------------

    def pages(self) -> list[dict]:
        root = None
        for o in self.objs.values():
            v = o.d if isinstance(o, Stream) else o
            if isinstance(v, dict) and v.get("Type") == Name("Catalog"):
                root = v
                break
        if root is None:
            raise ValueError("PDF has no document catalog")
        out: list[dict] = []
        seen: set[int] = set()      # cycle guard (corrupt Kids loops)

        def walk(node_ref, inherited):
            if isinstance(node_ref, Ref):
                if node_ref.num in seen or len(seen) > 100_000:
                    return
                seen.add(node_ref.num)
            node = self.resolve(node_ref)
            if not isinstance(node, dict):
                return
            inh = dict(inherited)
            for k in ("MediaBox", "Resources"):
                if k in node:
                    inh[k] = node[k]
            if node.get("Type") == Name("Pages"):
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(kid, inh)
            elif node.get("Type") == Name("Page"):
                out.append({**inh, **node})

        walk(root.get("Pages"), {})
        return out


def _png_predictor(data: bytes, columns: int, colors: int) -> bytes:
    rowlen = columns * colors
    out = bytearray()
    prev = bytearray(rowlen)
    i = 0
    while i + 1 + rowlen <= len(data) + rowlen and i < len(data):
        ft = data[i]
        row = bytearray(data[i + 1:i + 1 + rowlen])
        i += 1 + rowlen
        if ft == 2:          # Up (the only predictor xref streams use)
            for j in range(len(row)):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft != 0:
            raise ValueError(f"PNG predictor {ft} not supported")
        out += row
        prev = row
    return bytes(out)


# --- fonts --------------------------------------------------------------------------


def _parse_tounicode(cmap: bytes) -> dict[int, str]:
    """bfchar/bfrange sections of a ToUnicode CMap → code → str."""
    out: dict[int, str] = {}

    def uni(hx: bytes) -> str:
        b = bytes.fromhex(hx.decode("ascii"))
        return b.decode("utf-16-be", errors="replace")

    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", cmap, re.S):
        for src, dst in re.findall(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>",
                                   m.group(1)):
            out[int(src, 16)] = uni(dst)
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", cmap, re.S):
        body = m.group(1)
        for lo, hi, dst in re.findall(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>",
                body):
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            # the spec increments the LAST UTF-16 code unit; a longer
            # destination keeps its prefix (surrogate pairs / multi-
            # char mappings), so never chr() the full hex value
            prefix, base = dst[:-4], int(dst[-4:], 16)
            for c in range(lo_i, hi_i + 1):
                unit = base + (c - lo_i)
                if unit > 0xFFFF:
                    break               # malformed range — stop, not crash
                out[c] = uni(prefix + f"{unit:04X}".encode("ascii"))
        for lo, arr in re.findall(
                rb"<([0-9A-Fa-f]+)>\s*<[0-9A-Fa-f]+>\s*\[(.*?)\]",
                body, re.S):
            lo_i = int(lo, 16)
            for k, dst in enumerate(re.findall(rb"<([0-9A-Fa-f]+)>", arr)):
                out[lo_i + k] = uni(dst)
    return out


class _Font:
    def __init__(self, doc: PdfDocument, fd: dict):
        fd = doc.resolve(fd) or {}
        self.two_byte = doc.resolve(fd.get("Subtype")) == Name("Type0")
        tu = doc.resolve(fd.get("ToUnicode"))
        self.tounicode = (_parse_tounicode(doc.stream_data(tu))
                          if isinstance(tu, Stream) else None)
        self.differences: dict[int, str] = {}
        enc = doc.resolve(fd.get("Encoding"))
        if isinstance(enc, dict):
            cur = 0
            for item in doc.resolve(enc.get("Differences")) or []:
                if isinstance(item, (int, float)):
                    cur = int(item)
                else:
                    # glyph names: keep single-char names, /space etc.
                    self.differences[cur] = _GLYPH_NAMES.get(
                        str(item), "�")
                    cur += 1

    def decode(self, raw: bytes) -> str:
        if self.two_byte:
            codes = [int.from_bytes(raw[i:i + 2], "big")
                     for i in range(0, len(raw) - len(raw) % 2, 2)]
        else:
            codes = list(raw)
        out = []
        for c in codes:
            if self.tounicode is not None and c in self.tounicode:
                out.append(self.tounicode[c])
            elif not self.two_byte and c in self.differences:
                out.append(self.differences[c])
            elif not self.two_byte:
                out.append(bytes([c]).decode("latin-1"))
            else:
                out.append("�")
        return "".join(out)


_GLYPH_NAMES = {
    "space": " ", "period": ".", "comma": ",", "hyphen": "-",
    "colon": ":", "semicolon": ";", "question": "?", "exclam": "!",
    "parenleft": "(", "parenright": ")", "bracketleft": "[",
    "bracketright": "]", "slash": "/", "quotesingle": "'",
    "quotedbl": '"', "plus": "+", "equal": "=", "asterisk": "*",
    "numbersign": "#", "percent": "%", "ampersand": "&",
    "underscore": "_", "at": "@", "tilde": "~",
    **{n: chr(i) for i, n in zip(range(48, 58), (
        "zero", "one", "two", "three", "four", "five", "six", "seven",
        "eight", "nine"))},
    **{ch: ch for ch in
       "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"},
}


# --- content-stream text interpreter -------------------------------------------------


def _page_text_blocks(doc: PdfDocument, page: dict) -> list[dict]:
    media = [float(doc.resolve(x)) for x in
             (doc.resolve(page.get("MediaBox")) or [0, 0, 612, 792])]
    page_w, page_h = media[2] - media[0], media[3] - media[1]
    blocks: list[dict] = []

    contents = doc.resolve(page.get("Contents"))
    chunks = []
    for c in (contents if isinstance(contents, list) else [contents]):
        c = doc.resolve(c)
        if isinstance(c, Stream):
            chunks.append(doc.stream_data(c))

    _run_content(doc, b"\n".join(chunks),
                 doc.resolve(page.get("Resources")) or {},
                 [1.0, 0, 0, 1.0, 0, 0], page_h, blocks, depth=0)
    return blocks, page_w, page_h


_BI_EI_RE = re.compile(rb"[\x00\t\n\x0c\r ]EI(?=[\x00\t\n\x0c\r ]|$)")


def _run_content(doc: PdfDocument, content: bytes, res: dict,
                 ctm0: list[float], page_h: float, blocks: list[dict],
                 depth: int) -> None:
    """Interpret one content stream (page or Form XObject), appending
    text/figure blocks in DEVICE space (the CTM applies to text
    positions too, not just images)."""
    fonts = {str(k): _Font(doc, v) for k, v in
             (doc.resolve(res.get("Font")) or {}).items()}
    xobjs = doc.resolve(res.get("XObject")) or {}

    lex = _Lexer(content)
    stack: list = []
    font: _Font | None = None
    size = 12.0
    leading = 0.0
    tm = lm = None          # text matrix / line matrix (a b c d e f)
    ctm = list(ctm0)
    ctm_stack: list[list[float]] = []
    runs: list[tuple[float, float, float, str]] = []  # x, y, size, text

    def show(raw: bytes) -> None:
        nonlocal tm
        if font is None or tm is None:
            return
        text = font.decode(raw)
        if text:
            # device-space position: text matrix composed with the CTM
            dx = tm[4] * ctm[0] + tm[5] * ctm[2] + ctm[4]
            dy = tm[4] * ctm[1] + tm[5] * ctm[3] + ctm[5]
            eff = size * (tm[3] or 1.0) * (ctm[3] or 1.0)
            runs.append((dx, dy, abs(eff) or size, text))
            # estimated advance (0.5 em/char) in TEXT space so later
            # runs on the same line carry increasing x — feeds the
            # word-gap detection for foreign PDFs that kern word
            # spaces instead of encoding space glyphs
            tm = list(tm)
            tm[4] += 0.5 * size * len(text) * (tm[0] if tm[0] else 1.0)

    def flush_block() -> None:
        nonlocal runs
        if not runs:
            return
        # group runs into lines by baseline y (0.1 tolerance), order
        # lines top-down (PDF y is up), runs left-to-right
        lines: dict[float, list] = {}
        for x, y, s, t in runs:
            key = round(y, 1)
            lines.setdefault(key, []).append((x, s, t))
        ordered = sorted(lines.items(), key=lambda kv: -kv[0])
        line_dicts = []
        xs, ys, sizes = [], [], []
        for y, items in ordered:
            items.sort(key=lambda it: it[0])
            parts = []
            prev_end = None
            for x, s_sz, t in items:
                if prev_end is not None and x - prev_end > 0.2 * s_sz \
                        and parts and not parts[-1].endswith(" ") \
                        and not t.startswith(" "):
                    parts.append(" ")     # kerned word gap (estimate)
                parts.append(t)
                prev_end = x + 0.5 * s_sz * len(t)
            text = "".join(parts)
            line_dicts.append({"spans": [{"content": text}]})
            xs.append(items[0][0])
            ys.append(y)
            sizes.append(max(s for _x, s, _t in items))
            # x-extent estimate: start x is EXACT (from the text
            # matrix); width is chars × 0.55 em with the contribution
            # clamped to 40 chars so the bbox CENTER — what the
            # column x-cut classifies on — always stays in the
            # column the line STARTS in (long lines would otherwise
            # push the estimated center across the midline)
            xs.append(items[-1][0]
                      + 0.55 * items[-1][1] * min(len(items[-1][2]), 40))
        s_max = max(sizes)
        top_pdf = max(ys) + 0.8 * s_max
        bot_pdf = min(ys) - 0.2 * s_max
        blocks.append({
            "type": "text",
            # convert to top-left-origin layout space (y down)
            "bbox": [min(xs), page_h - top_pdf, max(xs),
                     page_h - bot_pdf],
            "lines": line_dicts,
        })
        runs = []

    while True:
        tok = lex.token()
        if tok is None:
            break
        if isinstance(tok, (int, float, bytes, Name)) or tok in (
                "<<", "[", "true", "false", "null"):
            if tok in ("<<", "["):
                stack.append(lex.value(tok))
            else:
                stack.append(tok)
            continue
        op = tok
        if op == "BT":
            tm = lm = [1, 0, 0, 1, 0, 0]
            runs = []
        elif op == "ET":
            flush_block()
            tm = lm = None
        elif op == "BI":
            # inline image: raw binary follows — skip to the EI
            # delimiter so pixel bytes never reach the text lexer
            m = _BI_EI_RE.search(content, lex.pos)
            if m is None:
                break
            lex.pos = m.end()
        elif op == "q":
            ctm_stack.append(list(ctm))
        elif op == "Q":
            ctm = ctm_stack.pop() if ctm_stack else list(ctm0)
        elif op == "cm" and len(stack) >= 6:
            m = [float(v) for v in stack[-6:]]
            ctm = [m[0] * ctm[0] + m[1] * ctm[2],
                   m[0] * ctm[1] + m[1] * ctm[3],
                   m[2] * ctm[0] + m[3] * ctm[2],
                   m[2] * ctm[1] + m[3] * ctm[3],
                   m[4] * ctm[0] + m[5] * ctm[2] + ctm[4],
                   m[4] * ctm[1] + m[5] * ctm[3] + ctm[5]]
        elif op == "Do" and stack:
            name = str(stack[-1])
            xo = doc.resolve(xobjs.get(name))
            sub = doc.resolve(xo.d.get("Subtype")) if isinstance(
                xo, Stream) else None
            if sub == Name("Image"):
                # unit square → ctm: x∈[e, e+a], y∈[f, f+d]
                x0, x1 = sorted((ctm[4], ctm[4] + ctm[0]))
                yb, yt = sorted((ctm[5], ctm[5] + ctm[3]))
                # /EPPSKind /Table is build_pdf's private marker for
                # table placeholders (PDF has no table primitive);
                # foreign PDFs never carry it → always image
                kind = ("table" if doc.resolve(xo.d.get("EPPSKind"))
                        == Name("Table") else "image")
                blocks.append({
                    "type": kind,
                    "bbox": [x0, page_h - yt, x1, page_h - yb],
                    "lines": [{"spans": [{"content": ""}]}],
                })
            elif sub == Name("Form") and depth < 8:
                # text inside Form XObjects (Word/LibreOffice output)
                fm = doc.resolve(xo.d.get("Matrix")) or [1, 0, 0, 1, 0, 0]
                fm = [float(v) for v in fm]
                sub_ctm = [fm[0] * ctm[0] + fm[1] * ctm[2],
                           fm[0] * ctm[1] + fm[1] * ctm[3],
                           fm[2] * ctm[0] + fm[3] * ctm[2],
                           fm[2] * ctm[1] + fm[3] * ctm[3],
                           fm[4] * ctm[0] + fm[5] * ctm[2] + ctm[4],
                           fm[4] * ctm[1] + fm[5] * ctm[3] + ctm[5]]
                sub_res = doc.resolve(xo.d.get("Resources")) or res
                _run_content(doc, doc.stream_data(xo), sub_res,
                             sub_ctm, page_h, blocks, depth + 1)
        elif op == "Tf" and len(stack) >= 2:
            size = float(stack[-1])
            font = fonts.get(str(stack[-2]))
        elif op in ("Td", "TD") and len(stack) >= 2 and lm is not None:
            tx, ty = float(stack[-2]), float(stack[-1])
            if op == "TD":
                leading = -ty
            lm = [lm[0], lm[1], lm[2], lm[3],
                  lm[4] + tx * lm[0] + ty * lm[2],
                  lm[5] + tx * lm[1] + ty * lm[3]]
            tm = list(lm)
        elif op == "Tm" and len(stack) >= 6:
            lm = [float(v) for v in stack[-6:]]
            tm = list(lm)
        elif op == "TL" and stack:
            leading = float(stack[-1])
        elif op == "T*" and lm is not None:
            lm = [lm[0], lm[1], lm[2], lm[3],
                  lm[4] - leading * lm[2], lm[5] - leading * lm[3]]
            tm = list(lm)
        elif op == "Tj" and stack:
            show(stack[-1] if isinstance(stack[-1], bytes) else b"")
        elif op in ("'", '"') and stack:
            if lm is not None:
                lm = [lm[0], lm[1], lm[2], lm[3],
                      lm[4] - leading * lm[2], lm[5] - leading * lm[3]]
                tm = list(lm)
            s = stack[-1]
            show(s if isinstance(s, bytes) else b"")
        elif op == "TJ" and stack and isinstance(stack[-1], list):
            for item in stack[-1]:
                if isinstance(item, bytes):
                    show(item)
                elif isinstance(item, (int, float)) and tm is not None:
                    tm = list(tm)
                    tm[4] -= float(item) / 1000.0 * size \
                        * (tm[0] if tm[0] else 1.0)
        stack = []
    flush_block()           # tolerate a missing final ET


def parse_pdf_pages(data: bytes) -> list[dict]:
    """PDF bytes → the engine's standard ``pages`` layout list."""
    doc = PdfDocument(data)
    pages = []
    for idx, page in enumerate(doc.pages()):
        blocks, w, h = _page_text_blocks(doc, page)
        pages.append({
            "page_idx": idx,
            "page_size": [w, h],
            "blocks": blocks,
        })
    return pages


# --- writer --------------------------------------------------------------------------


def build_pdf(pages: list[dict]) -> bytes:
    """The synthetic layout rendered as a real PDF: one BT/ET unit per
    layout block (the parser's block unit), every string as an
    Identity-H 2-byte hex string with a generated ToUnicode CMap — the
    encoding shape real Korean PDFs use."""
    # per-block rendered line strings (spans joined with " " — the
    # SAME strings the content streams will show), then glyph ids for
    # every distinct char in them, so hexstr can never miss a char
    def block_lines(blk: dict) -> list[str]:
        lines = [" ".join(sp.get("content", "")
                          for sp in ln.get("spans", []))
                 for ln in blk.get("lines", [])]
        return [ln for ln in lines if ln]

    chars: dict[str, int] = {}
    for p in pages:
        for b in p.get("blocks", []):
            for ln in block_lines(b):
                for ch in ln:
                    chars.setdefault(ch, len(chars) + 1)

    def hexstr(text: str) -> str:
        return "<" + "".join(f"{chars[ch]:04X}" for ch in text) + ">"

    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)            # 1-based object numbers

    # ToUnicode CMap
    bf = "\n".join(f"<{gid:04X}> <{_utf16(ch)}>"
                   for ch, gid in sorted(chars.items(), key=lambda kv: kv[1]))
    cmap = ("/CIDInit /ProcSet findresource begin 12 dict begin begincmap "
            "/CMapName /EPPS def /CMapType 2 def 1 begincodespacerange "
            "<0000> <FFFF> endcodespacerange " + f"{len(chars)} beginbfchar\n"
            + bf + "\nendbfchar endcmap CMapName currentdict /CMap "
            "defineresource pop end end").encode("ascii")
    tounicode = add(b"<< /Length " + str(len(cmap)).encode() + b" >>\n"
                    b"stream\n" + cmap + b"\nendstream")
    cidfont = add(b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /EPPS "
                  b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity)"
                  b" /Supplement 0 >> /DW 500 >>")
    font = add(b"<< /Type /Font /Subtype /Type0 /BaseFont /EPPS "
               b"/Encoding /Identity-H /DescendantFonts [" +
               f"{cidfont} 0 R".encode() + b"] /ToUnicode " +
               f"{tounicode} 0 R".encode() + b" >>")
    # shared 1×1 grayscale image XObjects: /Im1 for figures, /Tb1 for
    # table placeholders (writer-private convention — see parser)
    px = zlib.compress(b"\x80")
    xobj_body = (b"<< /Type /XObject /Subtype /Image /Width 1 /Height 1 "
                 b"/ColorSpace /DeviceGray /BitsPerComponent 8 "
                 b"/Filter /FlateDecode /Length "
                 + str(len(px)).encode() + b" >>\nstream\n" + px
                 + b"\nendstream")
    im1 = add(xobj_body)
    # the /EPPSKind entry is the parser's table marker (PDF has no
    # table primitive; an XObject NAME is forgeable by foreign files)
    tb1 = add(xobj_body.replace(b"/Subtype /Image",
                                b"/Subtype /Image /EPPSKind /Table"))

    page_ids = []
    kids_placeholder = add(b"")     # Pages node patched later
    for p in pages:
        w, h = (p.get("page_size") or [842.0, 1191.0])[:2]
        ops = ["q"]
        for blk in p.get("blocks", []):
            if "bbox" not in blk:
                continue
            if blk.get("type") in ("image", "table"):
                x0, y0, x1, y1 = blk["bbox"]
                name = "Im1" if blk["type"] == "image" else "Tb1"
                ops.append(f"q {x1 - x0:g} 0 0 {y1 - y0:g} {x0:g} "
                           f"{h - y1:g} cm /{name} Do Q")
                continue
            if blk.get("type") != "text":
                continue
            x0, y0, x1, y1 = blk["bbox"]
            lines = block_lines(blk)
            if not lines:
                continue
            fsize = 10.0
            n = len(lines)
            lead = max(fsize * 1.2, (y1 - y0) / max(n, 1))
            # first baseline near the block top (layout y is downward)
            ty = h - y0 - fsize
            ops.append(f"BT /F1 {fsize:g} Tf {lead:g} TL "
                       f"1 0 0 1 {x0:g} {ty:g} Tm")
            for i, ln in enumerate(lines):
                if i:
                    ops.append("T*")
                ops.append(hexstr(ln) + " Tj")
            ops.append("ET")
        ops.append("Q")
        content = " ".join(ops).encode("ascii")
        flate = zlib.compress(content, 6)
        cont_id = add(b"<< /Length " + str(len(flate)).encode()
                      + b" /Filter /FlateDecode >>\nstream\n" + flate
                      + b"\nendstream")
        page_ids.append(add(
            b"<< /Type /Page /Parent " + f"{kids_placeholder} 0 R".encode()
            + b" /MediaBox [0 0 " + f"{w:g} {h:g}".encode() + b"] "
            b"/Resources << /Font << /F1 " + f"{font} 0 R".encode()
            + b" >> /XObject << /Im1 " + f"{im1} 0 R".encode()
            + b" /Tb1 " + f"{tb1} 0 R".encode()
            + b" >> >> /Contents " + f"{cont_id} 0 R".encode() + b" >>"))

    objs[kids_placeholder - 1] = (
        b"<< /Type /Pages /Kids ["
        + b" ".join(f"{pid} 0 R".encode() for pid in page_ids)
        + b"] /Count " + str(len(page_ids)).encode() + b" >>")
    catalog = add(b"<< /Type /Catalog /Pages "
                  + f"{kids_placeholder} 0 R".encode() + b" >>")

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objs, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root " + f"{catalog} 0 R".encode() + b" >>\n"
            b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n")
    return bytes(out)


def _utf16(ch: str) -> str:
    return ch.encode("utf-16-be").hex().upper()
