"""Generate the checked-in FIC fact-sheet PDF fixture (stdlib only).

Produces a minimal but spec-valid single-page PDF whose content stream
is FlateDecode-compressed and shows one line per Tj — the same shape a
machine-generated fund fact sheet has. Re-run to regenerate:

    python tests/fixtures/gen_fic_pdf.py
"""

from __future__ import annotations

import pathlib
import zlib

LINES = [
    "Ficha Tecnica FIC",
    "Nombre: fondoPDF",
    "Gestor: Fiduciaria Uno",
    "Custodio: Banco Dos",
    "Fecha de corte: 31/07/2025",
    "Politica: inversion en renta fija, bonos y cdt de deuda publica",
    "Plazo 0-30: 66,96%",
    "Plazo 30-180: 33.04%",
    "Valor del fondo: 23232542280000",
    "Entidad calificadora: BRC Investors Servic",
]


def _esc(s: str) -> bytes:
    b = s.encode("cp1252")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def make_pdf(lines: list[str]) -> bytes:
    content = b"BT /F1 12 Tf 50 750 Td 14 TL " + b" ".join(
        b"(" + _esc(ln) + b") Tj T*" for ln in lines
    ) + b" ET"
    comp = zlib.compress(content)
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(comp)).encode() + b" /Filter /FlateDecode >>\n"
        b"stream\n" + comp + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, obj in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


if __name__ == "__main__":
    path = pathlib.Path(__file__).parent / "fic_fact_sheet.pdf"
    path.write_bytes(make_pdf(LINES))
    print(f"wrote {path} ({path.stat().st_size} bytes)")
