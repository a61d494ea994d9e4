"""Taxonomy abundance analysis (reference src/analysis.c).

Faithful ports: taxonTree_rank (:71), getOneSAM/dump_des_sam_file
(:191-466), getOneRST (:161), ana_get_tid (:1271), ana_meta (:1332),
ana_meta_base_M2 (:1620), ana_meta_loop_print (:1233).

Output is byte-compatible with the reference (float32 percentages through
%f formatting, empty tax_name fields, sibling order = descending weight
with stable ties).
"""
from __future__ import annotations

import sys
from dataclasses import dataclass

import numpy as np

MAX_U32 = 4294967295
MIN_SCORE = 10  # base-weighted gate (src/analysis.c:1470)


@dataclass
class Rst:
    read_name: str
    is_classify: str
    tid: int
    read_length: int
    mapq: int
    score: int


def load_taxonomy(path: str):
    """nodes.dmp -> (parent: dict, rank: dict, max_tid). max_tid = last
    line's tid + 1,000,000 (src/analysis.c:79-92)."""
    parent, rank = {}, {}
    last_tid = 0
    with open(path) as f:
        for line in f:
            fields = [t for t in line.replace("|", "\t").split("\t") if t.strip() != ""]
            parts = line.split("\t|\t")
            tid = int(parts[0])
            parent[tid] = int(parts[1])
            rank[tid] = parts[2].split("\t")[0].strip("|\t\n")
            last_tid = tid
    max_tid = last_tid + 1_000_000
    parent[1] = 0
    rank[1] = "root"
    rank[0] = "CLY_FAIL"
    return parent, rank, max_tid


def sam_to_rst(sam_path: str):
    """dump_des_sam_file equivalent: SAM lines -> RST records
    (src/analysis.c:191-294). Read length = sum of CIGAR M/I/S/X."""
    out = []
    with open(sam_path) as f:
        for line in f:
            if line.startswith("@"):
                continue
            t = line.rstrip("\n").split("\t")
            name = t[0]
            if t[2][0] == "*":
                out.append(Rst(name, "U", 0, 0, 0, 0))
                continue
            tid = int(t[2].split("|")[1])
            mapq = int(t[4])
            cigar = t[5]
            read_len = 0
            n = 0
            for ch in cigar:
                if ch.isdigit():
                    n = n * 10 + ord(ch) - 48
                else:
                    if ch in "MISX":
                        read_len += n
                    n = 0
            score = 0
            for tag in t[11:]:
                if tag.startswith("AS:i:") or tag.startswith("NM:i:"):
                    score = int(tag.split(":")[2])
                    break
            out.append(Rst(name, "C", tid, read_len, mapq, score))
    return out


def _ana_get_tid(records, i, max_tid, parent):
    """src/analysis.c:1271-1330. Returns (final_tid, read_len, coverage,
    mapq_of_first, next_i). One call consumes one read group."""
    rst = records[i]
    read_len = rst.read_length
    mapq = rst.mapq
    if rst.is_classify != "C":
        return 0, read_len, 0.0, mapq, i + 1
    tid, score, coverage = 0, 0, np.float32(0)
    if rst.tid <= max_tid:
        tid = rst.tid
        score = rst.score
        coverage = (np.float32(score) / np.float32(rst.read_length)
                    if rst.read_length > 0 else np.float32(0))
    name = rst.read_name
    j = i + 1
    while True:
        if j >= len(records):
            # C returns 0 when the group ends at EOF (src/analysis.c:1303):
            # the final read's tid is dropped (still counted as a read)
            return 0, read_len, coverage, mapq, j
        nxt = records[j]
        if nxt.read_name != name:
            break
        if score == 0:
            break  # nxt stays unconsumed and becomes the next "read"
        j += 1
        if nxt.score != score:
            continue
        if nxt.tid > max_tid:
            continue
        p_tid = nxt.tid
        while True:
            if p_tid == tid:
                tid = nxt.tid
                break
            if p_tid < 1 or p_tid == MAX_U32:
                break
            p_tid = parent.get(p_tid, MAX_U32)
    return tid, read_len, coverage, mapq, j


def _print_tree(weights, mapq_w, children, rank, node, level, total, is_base,
                out):
    w = weights.get(node, 0)
    rate = np.float32(w) / np.float32(total) * np.float32(100)
    if rate < 0.01:
        return
    out.write("|" * level)
    if is_base:
        mq = np.float32(mapq_w.get(node, 0)) / np.float32(w) * rate
        out.write(f"{rank.get(node, '')} TID:{node}  {rate:f}%, mapQ:{mq:f}\n")
    else:
        out.write(f"{rank.get(node, '')} TID:{node}  {rate:f}%\n")
    for ch in children.get(node, []):
        _print_tree(weights, mapq_w, children, rank, ch, level + 1, total,
                    is_base, out)


def _propagate(leaf_weight, leaf_mapq, parent):
    """Weight propagation + child adjacency, in descending-leaf-weight order
    (stable, ascending tid ties; src/analysis.c:1416-1446)."""
    order = sorted(leaf_weight.keys(), key=lambda t: (-leaf_weight[t], t))
    weights, mapq_w, children = {}, {}, {}
    for tid in order:
        w = leaf_weight[tid]
        m = leaf_mapq.get(tid, 0)
        weights[tid] = weights.get(tid, 0) + w
        mapq_w[tid] = mapq_w.get(tid, 0) + m
        c = tid
        while True:
            p = parent.get(c, MAX_U32)
            if p < 1 or p == MAX_U32:
                break
            weights[p] = weights.get(p, 0) + w
            mapq_w[p] = mapq_w.get(p, 0) + m
            lst = children.setdefault(p, [])
            if c not in lst:
                lst.append(c)
            c = p
    return weights, mapq_w, children


def ana_meta(rst_records, tax_path, rst_name, out=sys.stdout):
    """Read-count abundance tree (src/analysis.c:1332-1458)."""
    out.write(f"Current read {rst_name}\t{rst_name}\t")
    parent, rank, max_tid = load_taxonomy(tax_path)
    node_count: dict = {}
    total_reads = 0
    i = 0
    while i < len(rst_records):
        total_reads += 1
        tid, _rl, _cov, _mq, i = _ana_get_tid(rst_records, i, max_tid, parent)
        if tid > 0:
            node_count[tid] = node_count.get(tid, 0) + 1
    weights, mapq_w, children = _propagate(node_count, {}, parent)
    out.write("Data:\n")
    _print_tree(weights, mapq_w, children, rank, 1, 0, total_reads, False, out)
    out.write(f"total_read_number :{total_reads}\t")


def ana_meta_base(rst_records, tax_path, rst_name, out=sys.stdout):
    """Base-weighted abundance tree, M2 variant with mapQ
    (src/analysis.c:1620-1752)."""
    out.write(f"Current read {rst_name}\t{rst_name}\t")
    parent, rank, max_tid = load_taxonomy(tax_path)
    node_base: dict = {}
    node_mapq: dict = {}
    total_base = 0
    low_num = low_base = 0
    i = 0
    while i < len(rst_records):
        mapq = rst_records[i].mapq
        tid, read_len, cov, _mq, i = _ana_get_tid(rst_records, i, max_tid, parent)
        if tid > 0 and np.float32(cov) * read_len > MIN_SCORE:
            total_base += read_len
            node_base[tid] = node_base.get(tid, 0) + read_len
            node_mapq[tid] = node_mapq.get(tid, 0) + read_len * mapq
            if cov < 0.08:
                low_base += read_len
                low_num += 1
    weights, mapq_w, children = _propagate(node_base, node_mapq, parent)
    out.write("Analysis based on base number:\n")
    _print_tree(weights, mapq_w, children, rank, 1, 0, total_base, True, out)
    out.write(f"total_mapped_base_number :{total_base}\n")
    out.write(f"low identity read (identity <= 75%) number :{low_num}\t")
    out.write(f"total base {low_base}\t")


def run_analysis(mode: str, args: list, out=sys.stdout):
    if mode == "ana_meta":
        sam, tax = args
        ana_meta(sam_to_rst(sam), tax, sam + ".temp", out)
    elif mode == "ana_meta_base":
        sam, tax = args
        ana_meta_base(sam_to_rst(sam), tax, sam + ".temp", out)
    else:
        raise SystemExit(f"analysis mode [{mode}] unsupported")
