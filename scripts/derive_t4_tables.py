"""Derive the ITU-T T.4 Modified-Huffman run-length code tables from an
independent implementation (Java ImageIO's CCITT RLE encoder) by
anchor-free longest-common-prefix extraction, and write them to
ocr_inference_spark/_t4_tables.py.

Why empirical: the T.4 tables have ~210 entries; hand-typing them from
memory invites silent single-entry errors that only corrupt specific
run lengths. Instead we encode probe rows with KNOWN run structure
through Java's encoder and recover each code as the longest common
prefix of streams that share it:

- an RLE row `white w | black b` encodes as `W(w) B(b) pad`; the LCP
  of the streams over several b values is exactly W(w) (the black codes
  diverge at their first bits, so they contribute nothing to the LCP);
- rows starting black prepend W(0), giving the black codes the same
  way; makeup codes fall out of runs >= 64 with the terminating part
  varied.

The result is verified prefix-free and then cross-validated in
tests/test_imgcodec_formats.py by decoding Java-encoded fixtures.

Usage: python scripts/derive_t4_tables.py <FaxWrite-classpath>
(expects the FaxWrite helper class, see tests/data/java_tools/).
"""

from __future__ import annotations

import os
import struct
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def tiff_strip(data: bytes) -> bytes:
    """First strip bytes of a (little- or big-endian) TIFF."""
    bo = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(bo + "I", data[4:8])
    (n,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
    fields = {}
    for i in range(n):
        off = ifd_off + 2 + i * 12
        tag, typ, count = struct.unpack(bo + "HHI", data[off : off + 8])
        size = {1: 1, 3: 2, 4: 4}.get(typ, 0) * count
        if size == 0:
            continue
        if size <= 4:
            raw = data[off + 8 : off + 8 + size]
        else:
            (voff,) = struct.unpack(bo + "I", data[off + 8 : off + 12])
            raw = data[voff : voff + size]
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        fields[tag] = list(struct.unpack(bo + fmt * count, raw))
    offs, cnts = fields[273], fields[279]
    assert len(offs) == 1, "probe must be single-strip"
    assert fields.get(266, [1])[0] == 1, "expect MSB-first fill order"
    return data[offs[0] : offs[0] + cnts[0]]


def bits_of(data: bytes) -> str:
    return "".join(f"{b:08b}" for b in data)


def lcp(strings: list[str]) -> str:
    s1, s2 = min(strings), max(strings)
    for i, (a, b) in enumerate(zip(s1, s2)):
        if a != b:
            return s1[:i]
    return s1[: min(len(s1), len(s2))]


def main() -> None:
    cp = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tiffcheck"
    tmp = Path(tempfile.mkdtemp(prefix="t4derive_"))
    probes: list[tuple[str, list[int]]] = []  # (name, runs [w,b,w,b...])

    # white codes W(w): rows `white w | black b`, b in 1..8
    BSET = range(1, 9)
    for w in list(range(0 if False else 0, 64)) + [64 * k for k in range(1, 41)]:
        for b in BSET:
            if w == 0:
                continue  # white-0 rows start black; handled below
            probes.append((f"w_{w}_{b}", [w, b]))
        # makeup extraction variant: white (w + r) for w >= 64 handled below
    # white terminating via makeup remainder: rows white (64k + r) | black 2
    for k in range(1, 41):
        for r in range(1, 9):
            probes.append((f"wm_{64 * k}_{r}", [64 * k + r, 2]))
    # black codes B(b): rows `black b | white t`, t in 1..8
    for b in list(range(1, 64)) + [64 * k for k in range(1, 41)]:
        for t in BSET:
            probes.append((f"b_{b}_{t}", [0, b, t]))
    for k in range(1, 41):
        for r in range(1, 9):
            probes.append((f"bm_{64 * k}_{r}", [0, 64 * k + r, 2]))
    # W(0): the prefix of every black-start row; B(0)/W(0) terminators
    # after exact-makeup runs: rows `white 64k | black 2` / `black 64k | white 2`

    # build raw files + spec lines
    spec_lines = []
    for name, runs in probes:
        # tiny widths crash Java's RLE buffer sizing; a trailing filler
        # run (opposite colour, AFTER the varied run) widens the row
        # without touching any code the LCP extraction looks at
        if sum(runs) < 80:
            runs = runs + [80 - sum(runs)]
        width = sum(runs)
        row = bytearray()
        white = True
        for r in runs:
            row += bytes([1 if white else 0]) * r
            white = not white
        raw = tmp / f"{name}.bin"
        raw.write_bytes(bytes(row))
        out = tmp / f"{name}.tif"
        spec_lines.append(f"{width} 1 {raw} {out} CCITT RLE")
    r = subprocess.run(
        [os.environ["JAVA_HOME"] + "/bin/java", "-cp", cp, "FaxWrite"],
        input="\n".join(spec_lines) + "\n",
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        sys.exit(f"FaxWrite failed: {r.stderr[-2000:]}")
    streams = {
        name: bits_of(tiff_strip((tmp / f"{name}.tif").read_bytes()))
        for name, _ in probes
    }

    white: dict[int, str] = {}
    black: dict[int, str] = {}
    # W(w) for 1..63 and makeups: LCP over b of `white w | black b`
    for w in list(range(1, 64)) + [64 * k for k in range(1, 41)]:
        group = [streams[f"w_{w}_{b}"] for b in BSET]
        code = lcp(group)
        if w >= 64:
            # stream = WM(w) + WT(0) + B(b): the LCP is WM(w)+WT(0);
            # strip WT(0) after it is known (second pass below)
            white[-w] = code  # stash combined; resolved later
        else:
            white[w] = code
    # white makeups alone: LCP over r of `white (64k+r) | black 2`
    for k in range(1, 41):
        group = [streams[f"wm_{64 * k}_{r}"] for r in range(1, 9)]
        white[64 * k] = lcp(group)
    # W(0): LCP of ALL black-start rows
    white[0] = lcp([streams[f"b_{b}_{t}"] for b in range(1, 64) for t in BSET])
    # WT(0) check: combined stash minus makeup must equal W(0)? No —
    # `white 64k` exactly = WM(64k)+WT(0): derive WT0 from the stash
    wt0 = set()
    for k in range(1, 41):
        comb = white.pop(-64 * k)
        assert comb.startswith(white[64 * k]), (k, "makeup prefix mismatch")
        wt0.add(comb[len(white[64 * k]) :])
    assert len(wt0) == 1, f"inconsistent white terminating 0: {wt0}"
    (wt0_code,) = wt0
    assert wt0_code == white[0], (
        f"W(0) disagreement: black-start prefix {white[0]!r} vs "
        f"makeup remainder {wt0_code!r}"
    )

    # B(b): LCP over t of black-start rows, minus W(0)
    w0 = white[0]
    for b in list(range(1, 64)) + [64 * k for k in range(1, 41)]:
        group = [streams[f"b_{b}_{t}"] for t in BSET]
        code = lcp(group)
        assert code.startswith(w0), (b, "missing W(0) prefix")
        if b >= 64:
            black[-b] = code[len(w0) :]  # BM(b)+BT(0) combined
        else:
            black[b] = code[len(w0) :]
    for k in range(1, 41):
        group = [streams[f"bm_{64 * k}_{r}"] for r in range(1, 9)]
        code = lcp(group)
        assert code.startswith(w0)
        black[64 * k] = code[len(w0) :]
    bt0 = set()
    for k in range(1, 41):
        comb = black.pop(-64 * k)
        assert comb.startswith(black[64 * k])
        bt0.add(comb[len(black[64 * k]) :])
    assert len(bt0) == 1, f"inconsistent black terminating 0: {bt0}"
    (black[0],) = bt0

    # sanity: prefix-free within each colour's decode alphabet
    for name, codes in (("white", white), ("black", black)):
        items = sorted(codes.items(), key=lambda kv: kv[1])
        for (r1, c1), (r2, c2) in zip(items, items[1:]):
            assert not c2.startswith(c1), (name, r1, r2, c1, c2)

    out = REPO / "ocr_inference_spark" / "_t4_tables.py"
    with out.open("w") as f:
        f.write(
            '"""ITU-T T.4 Modified-Huffman run-length code tables.\n\n'
            "GENERATED by scripts/derive_t4_tables.py: each code was\n"
            "extracted from Java ImageIO's independent CCITT encoder by\n"
            "longest-common-prefix probing (see that script's docstring),\n"
            "verified prefix-free, and cross-validated by the fax codec\n"
            'tests. Keys are run lengths; values MSB-first bitstrings."""\n\n'
        )
        for name, codes in (("WHITE_CODES", white), ("BLACK_CODES", black)):
            f.write(f"{name} = {{\n")
            for run in sorted(codes):
                f.write(f"    {run}: \"{codes[run]}\",\n")
            f.write("}\n\n")
    print(f"wrote {out}: {len(white)} white + {len(black)} black codes")


if __name__ == "__main__":
    main()
