"""Build a deSAMBA library FASTA from a LOCAL RefSeq mirror.

The reference's `download` script (reference repo `download:26-33,223`)
fetches `*_genomic.fna.gz` per assembly_summary.txt row and rewrites
every FASTA header to

    >tid|<TAXID>|ref|<original header>

(the `tid|...|` prefix is what cly.c's get_ref_tax / the analysis layer
parse taxonomy ids from). This environment has no egress, but the same
transformation applies verbatim to a mirror you already have on disk;
this tool is the offline half of `download`:

  python3 tools/prepare_library.py <mirror_dir> <assembly_summary.txt> \
      <out_library.fa> [--taxids 10239,2] [--assembly-level "Complete Genome"]

<mirror_dir> holds `<accession>_<asm>_genomic.fna[.gz]` files named as
NCBI names them (the basename of the summary's ftp_path column, exactly
what `download` leaves in $LIBDIR/$DOMAIN). Files without a summary row
are skipped with a warning; summary rows without a file are reported at
the end (the download list you still need).
"""
from __future__ import annotations

import argparse
import gzip
import os
import sys

# assembly_summary.txt columns (1-based, cf. download:169-177)
TAXID_FIELD = 6
SPECIES_TAXID_FIELD = 7
ASM_LEVEL_FIELD = 12
FTP_PATH_FIELD = 20


def parse_summary(path, taxids=None, levels=None):
    """{file basename -> taxid} for the filtered assembly rows."""
    want = {}
    with open(path, encoding="utf-8", errors="replace") as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            cols = line.rstrip("\n").split("\t")
            if len(cols) < FTP_PATH_FIELD:
                continue
            taxid = cols[TAXID_FIELD - 1]
            level = cols[ASM_LEVEL_FIELD - 1]
            ftp = cols[FTP_PATH_FIELD - 1]
            if ftp in ("", "na"):
                continue
            if taxids and taxid not in taxids and \
                    cols[SPECIES_TAXID_FIELD - 1] not in taxids:
                continue
            if levels and level not in levels:
                continue
            # download:223 — s#([^/]*)$#\1/\1_genomic.fna.gz#
            base = ftp.rstrip("/").rsplit("/", 1)[-1]
            want[base + "_genomic.fna"] = taxid
    return want


def rewrite(src_path, taxid, out):
    """Stream one genome file, prefixing headers like download:32
    (sed "s/^>/>tid|$TAXID|ref|/")."""
    op = gzip.open if src_path.endswith(".gz") else open
    with op(src_path, "rt", encoding="utf-8", errors="replace") as f:
        for line in f:
            if line.startswith(">"):
                out.write(f">tid|{taxid}|ref|{line[1:]}")
            else:
                out.write(line)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("mirror_dir")
    ap.add_argument("summary")
    ap.add_argument("out_fa")
    ap.add_argument("--taxids", default=None,
                    help="comma list; keeps rows whose taxid OR species "
                         "taxid matches (download's TAXID filter)")
    ap.add_argument("--assembly-level", default=None,
                    help='e.g. "Complete Genome" (download -a)')
    args = ap.parse_args(argv)

    taxids = set(args.taxids.split(",")) if args.taxids else None
    levels = {args.assembly_level} if args.assembly_level else None
    want = parse_summary(args.summary, taxids, levels)
    if not want:
        print("no assembly rows matched the filters", file=sys.stderr)
        return 1

    present = {}
    for name in sorted(os.listdir(args.mirror_dir)):
        stem = name[:-3] if name.endswith(".gz") else name
        if stem in want:
            present[stem] = os.path.join(args.mirror_dir, name)

    n = 0
    with open(args.out_fa, "w", encoding="utf-8") as out:
        for stem in sorted(present):
            rewrite(present[stem], want[stem], out)
            n += 1
    missing = sorted(set(want) - set(present))
    print(f"library: {n} genomes -> {args.out_fa}")
    if missing:
        print(f"missing from mirror ({len(missing)}):", file=sys.stderr)
        for m in missing[:20]:
            print(f"  {m}.gz", file=sys.stderr)
        if len(missing) > 20:
            print(f"  ... and {len(missing) - 20} more", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
