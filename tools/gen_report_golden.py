#!/usr/bin/env python3
"""Generate the S8 report-sink golden by EXECUTING the reference's
generate_assessment_pdf (app.py:49-263) against a text-recording fake
FPDF: every pdf.cell() text lands on a visual line (cells join until a
line-ending cell), add_page starts a new page through the real header()
code, and footers are appended per page once the page count is known.
The result is the PDF's textual content, page-structured — the target
our Scala ReportRenderer must reproduce byte-identically.

Usage: gen_report_golden.py <ddl-file> <out-file>
"""
import ast
import sys
import textwrap

sys.path.insert(0, "/root/reference")
from db2ice.assessor import Assessor, ReadinessLevel, IssueSeverity  # noqa: E402

FIXED_TS = "2026-01-01 00:00:00"


class FakeDatetime:
    @staticmethod
    def now():
        class T:
            def strftime(self, fmt):
                return FIXED_TS
        return T()


class FPDF:
    """Text recorder with fpdf's cell/line surface."""

    def __init__(self):
        self.pages = []
        self._line = []

    def alias_nb_pages(self): pass
    def set_auto_page_break(self, auto=True, margin=0): pass
    def set_font(self, *a, **k): pass
    def set_text_color(self, *a): pass
    def set_fill_color(self, *a): pass
    def set_y(self, y): pass
    def get_y(self): return 0  # no geometry: only explicit add_page breaks
    def page_no(self): return len(self.pages)

    def add_page(self):
        self._flush()
        self.pages.append([])
        self.header()

    def ln(self, h=None):
        self._flush()

    def _flush(self):
        if self._line:
            self.pages[-1].append("".join(self._line))
            self._line = []

    def cell(self, w=0, h=0, txt="", border=0, ln=0, align="", fill=False):
        self._line.append(str(txt))
        if ln:
            self._flush()

    def output(self):
        self._flush()
        return b""


def load_reference_pdf_code():
    src = open("/root/reference/app.py").read()
    tree = ast.parse(src)
    cls = None
    fns = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name == "AssessmentPDF":
            cls = textwrap.dedent(ast.get_source_segment(src, node))
        if isinstance(node, ast.FunctionDef) and node.name in (
                "generate_assessment_pdf", "generate_conversion_pdf"):
            fns[node.name] = ast.get_source_segment(src, node)
    ns = {
        "FPDF": FPDF,
        "PDF_AVAILABLE": True,
        "datetime": FakeDatetime,
        "ReadinessLevel": ReadinessLevel,
        "IssueSeverity": IssueSeverity,
    }
    exec(cls, ns)
    for f in fns.values():
        exec(f, ns)
    return ns


def run_capture(fn, *args):
    pdf_holder = {}
    orig_init = FPDF.__init__

    def capture_init(self):
        orig_init(self)
        pdf_holder["pdf"] = self
    FPDF.__init__ = capture_init
    try:
        fn(*args)
    finally:
        FPDF.__init__ = orig_init
    pdf = pdf_holder["pdf"]
    nb = len(pdf.pages)
    lines = []
    for i, page in enumerate(pdf.pages):
        lines.extend(page)
        lines.append(f"Page {i + 1}/{nb} - DB2ICE by Snowflake Cortex Code")
    return nb, lines


def main(ddl_path, out_path, kind="assessment"):
    ddl = open(ddl_path).read()
    report = Assessor().assess(ddl)
    ns = load_reference_pdf_code()
    if kind == "assessment":
        nb, lines = run_capture(ns["generate_assessment_pdf"], report)
    else:
        from db2ice.converter import DB2IceConverter
        result = DB2IceConverter().convert(ddl)
        nb, lines = run_capture(ns["generate_conversion_pdf"], result, report)
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"{out_path}: {nb} pages, {len(lines)} lines")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else "assessment")
