"""Minimal test double for the `xlsxwriter` package (test-only).

xlsxwriter is not installed in this environment, so the Excel branch of
`pipelines/quantify_batch.write_reports` (reference parity:
quantify_droplets_batch.py:169-181) could otherwise only ever execute its
CSV fallback in CI. This shim implements exactly the API surface pandas'
xlsxwriter ExcelWriter engine uses (pandas/io/excel/_xlsxwriter.py):

    Workbook(handle, **kw) . sheetnames . add_worksheet .
    get_worksheet_by_name . add_format . close
    Worksheet . write . merge_range . freeze_panes . autofilter

and `close()` emits a REAL minimal .xlsx — an OOXML zip with
inline-string/number cells — so tests can round-trip the workbook and
verify sheet names, headers and values end-to-end through the exact
pandas code path that runs in production when the real xlsxwriter is
installed. Deployments still use the real package (pyproject extras)."""

from __future__ import annotations

import zipfile
from xml.sax.saxutils import escape

__version__ = "3.2.0"  # satisfies pandas' minimum-version check


class Format:
    def __init__(self, props=None):
        self.props = dict(props or {})


class Worksheet:
    def __init__(self, name: str):
        self.name = name
        self.cells = {}  # (row, col) -> python value
        self.frozen = None
        self.autofilter_range = None

    def write(self, row, col, val, fmt=None):
        self.cells[(row, col)] = val
        return 0

    def merge_range(self, r0, c0, r1, c1, val, fmt=None):
        self.cells[(r0, c0)] = val
        return 0

    def freeze_panes(self, *args):
        self.frozen = args

    def autofilter(self, rng):
        self.autofilter_range = rng


def _col_name(c: int) -> str:
    s = ""
    c += 1
    while c:
        c, r = divmod(c - 1, 26)
        s = chr(ord("A") + r) + s
    return s


def _sheet_xml(ws: Worksheet) -> str:
    rows: dict = {}
    for (r, c), v in sorted(ws.cells.items()):
        rows.setdefault(r, []).append((c, v))
    body = []
    for r in sorted(rows):
        cells = []
        for c, v in rows[r]:
            ref = f"{_col_name(c)}{r + 1}"
            if isinstance(v, bool):
                cells.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
            elif isinstance(v, (int, float)):
                cells.append(f'<c r="{ref}"><v>{v!r}</v></c>')
            else:
                cells.append(f'<c r="{ref}" t="inlineStr"><is><t>'
                             f"{escape(str(v))}</t></is></c>")
        body.append(f'<row r="{r + 1}">{"".join(cells)}</row>')
    return ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData>'
            + "".join(body) + "</sheetData></worksheet>")


class Workbook:
    def __init__(self, handle, **engine_kwargs):
        self._handle = handle
        self._sheets = []
        self.sheetnames = {}

    def add_worksheet(self, name=None):
        name = name or f"Sheet{len(self._sheets) + 1}"
        ws = Worksheet(name)
        self._sheets.append(ws)
        self.sheetnames[name] = ws
        return ws

    def get_worksheet_by_name(self, name):
        return self.sheetnames.get(name)

    def add_format(self, props=None):
        return Format(props)

    def close(self):
        ct = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
              '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
              'content-types">'
              '<Default Extension="rels" ContentType="application/'
              'vnd.openxmlformats-package.relationships+xml"/>'
              '<Default Extension="xml" ContentType="application/xml"/>'
              '<Override PartName="/xl/workbook.xml" ContentType='
              '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
              'sheet.main+xml"/>']
        for i in range(len(self._sheets)):
            ct.append(f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
                      'ContentType="application/vnd.openxmlformats-'
                      'officedocument.spreadsheetml.worksheet+xml"/>')
        ct.append("</Types>")

        rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<Relationships xmlns="http://schemas.openxmlformats.org/'
                'package/2006/relationships">'
                '<Relationship Id="rId1" Type="http://schemas.'
                'openxmlformats.org/officeDocument/2006/relationships/'
                'officeDocument" Target="xl/workbook.xml"/></Relationships>')

        sheets_xml = "".join(
            f'<sheet name="{escape(ws.name)}" sheetId="{i + 1}" '
            f'r:id="rId{i + 1}"/>' for i, ws in enumerate(self._sheets))
        wb = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
              '<workbook xmlns="http://schemas.openxmlformats.org/'
              'spreadsheetml/2006/main" xmlns:r="http://schemas.'
              'openxmlformats.org/officeDocument/2006/relationships">'
              f"<sheets>{sheets_xml}</sheets></workbook>")
        wb_rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                   '<Relationships xmlns="http://schemas.openxmlformats.org/'
                   'package/2006/relationships">'
                   + "".join(
                       f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
                       'openxmlformats.org/officeDocument/2006/relationships/'
                       f'worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
                       for i in range(len(self._sheets)))
                   + "</Relationships>")

        with zipfile.ZipFile(self._handle, "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr("[Content_Types].xml", "".join(ct))
            z.writestr("_rels/.rels", rels)
            z.writestr("xl/workbook.xml", wb)
            z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
            for i, ws in enumerate(self._sheets):
                z.writestr(f"xl/worksheets/sheet{i + 1}.xml", _sheet_xml(ws))
