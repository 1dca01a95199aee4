#!/usr/bin/env python3
"""Extract and package the reads aligned to a region of a draft assembly
— a self-contained bundle (reads + raw signal + draft + BAM subset) for
reproducing/reporting a problematic polishing window.

Behavioral rebuild of the reference's
scripts/extract_reads_aligned_to_region.py, on this framework's own IO
stack (no pysam/h5py): fetch the BAM records overlapping -w, subset the
fastq to those reads, collect their raw-signal files from the readdb
(per-read FAST5 paths are copied; a shared SLOW5/BLOW5 is rewritten as
a subset .slow5), and tar.gz everything with a log.

Usage:
  extract_reads_aligned_to_region.py -b aln.bam -r reads.fastq \
      -g draft.fa -w "tig01:10000-20000" [-o reads_subset] [-v]
"""

import argparse
import os
import sys
import tarfile
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from nanopolish_tpu.apps.bam_processor import parse_region  # noqa: E402
from nanopolish_tpu.io.bam import BamReader  # noqa: E402
from nanopolish_tpu.io.readdb import ReadDB  # noqa: E402


def subset_fastq(reads_path, names, out_path):
    """Copy the records of `names` from a fasta/fastq(.gz) file."""
    import gzip

    opener = gzip.open if reads_path.endswith(".gz") else open
    kept = 0
    with opener(reads_path, "rt") as fh, open(out_path, "w") as out:
        first = fh.read(1)
        fh.seek(0)
        if first == ">":                                  # fasta
            name, keep = None, False
            for line in fh:
                if line.startswith(">"):
                    name = line[1:].split()[0]
                    keep = name in names
                    kept += keep
                if keep:
                    out.write(line)
        else:                                             # fastq
            while True:
                hdr = fh.readline()
                if not hdr:
                    break
                seq, plus, qual = fh.readline(), fh.readline(), fh.readline()
                if hdr[1:].split()[0] in names:
                    out.writelines([hdr, seq, plus, qual])
                    kept += 1
    return kept


def main(argv=None):
    p = argparse.ArgumentParser(
        description="extract and package reads aligned to a region")
    p.add_argument("-b", "--bam", required=True)
    p.add_argument("-r", "--reads", required=True)
    p.add_argument("-g", "--genome", required=True)
    p.add_argument("-w", "--window", required=True,
                   help='e.g. "tig000001:10000-20000"')
    p.add_argument("-o", "--output-prefix", default="reads_subset")
    p.add_argument("-v", "--verbose", action="store_true")
    opt = p.parse_args(argv)

    def log(msg):
        if opt.verbose:
            sys.stderr.write(msg + "\n")

    contig, start, end = parse_region(opt.window)
    reader = BamReader(opt.bam)
    names = set()
    n_records = 0
    for rec in reader.fetch(contig, max(start, 0),
                            end if end >= 0 else None):
        if not rec.is_unmapped:
            names.add(rec.qname)
            n_records += 1
    reader.close()
    log(f"{len(names)} reads ({n_records} records) overlap {opt.window}")
    if not names:
        sys.stderr.write(f"no reads aligned to {opt.window}\n")
        return 1

    db = ReadDB()
    db.load(opt.reads)

    lines = [f"window: {opt.window}", f"reads: {len(names)}"]
    with tempfile.TemporaryDirectory() as tmp:
        fq_out = os.path.join(tmp, "region_reads.fastq")
        kept = subset_fastq(opt.reads, names, fq_out)
        lines.append(f"fastq records extracted: {kept}")

        # collect signal sources from the readdb
        signal_files = {}
        missing = 0
        for name in sorted(names):
            path = db.get_signal_path(name)
            if not path or not os.path.exists(path):
                missing += 1
                continue
            signal_files.setdefault(path, []).append(name)
        lines.append(f"reads without signal: {missing}")

        members = [(fq_out, "region_reads.fastq"),
                   (opt.genome, os.path.basename(opt.genome))]
        slow5_i = 0
        for path, rids in signal_files.items():
            if path.endswith((".slow5", ".blow5")):
                # rewrite the shared file as a subset holding only the
                # region's reads
                from nanopolish_tpu.io.slow5 import Slow5File, Slow5Writer
                sub = os.path.join(tmp, f"region_signal_{slow5_i}.slow5")
                slow5_i += 1
                with Slow5File(path) as sf, Slow5Writer(sub) as sw:
                    for rid in rids:
                        r = sf.get_read(rid)
                        if r is not None:
                            sw.write(rid, r.raw_signal, r.digitisation,
                                     r.offset, r.range, r.sampling_rate)
                members.append((sub, os.path.basename(sub)))
                log(f"subset {len(rids)} reads from {path}")
            else:
                members.append((path, os.path.join("signal",
                                                   os.path.basename(path))))

        tar_path = opt.output_prefix + ".tar.gz"
        with tarfile.open(tar_path, "w:gz") as tar:
            for src, arc in members:
                tar.add(src, arcname=os.path.join(opt.output_prefix, arc))
        lines.append(f"archive: {tar_path} ({len(members)} files)")

    with open(opt.output_prefix + ".log", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(tar_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
