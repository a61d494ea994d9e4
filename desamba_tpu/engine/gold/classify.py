"""Top-level classify: the fast/slow mode ladder per read
(src/cly.c:3064-3132) plus driver-level options (src/cly_mt.c:482-527).
"""
from __future__ import annotations

from dataclasses import dataclass, field

from ...constants import (
    DEFAULT_L_MIN_MATCHING,
    DEFAULT_MAX_SEC_N,
    DEFAULT_MIN_SCORE,
    MIN_READ_LEN,
)
from .chain import resolve_tree
from .fastslow import fast_classify, slow_classify
from .fm import FM
from .islands import get_islands
from .mapq import mapq_tables
from .mapseed import Locator
from .rescore import delete_small_score_rst, detect_primary


@dataclass
class Options:
    filter_min_length: int = DEFAULT_L_MIN_MATCHING   # -l
    max_sec_n: int = DEFAULT_MAX_SEC_N                # -r
    filter_min_score: int = DEFAULT_MIN_SCORE         # -s
    out_format: str = "SAM"                           # -f

    @property
    def filter_min_score_lv3(self):
        return self.filter_min_score + 10


@dataclass
class StreamState:
    """Per-worker batch history (src/cly.h:157 max_read_l)."""
    max_read_l: int = 0


@dataclass
class ReadResult:
    name: str
    seq: str
    qual: str | None
    read_len: int
    chains: list = field(default_factory=list)
    anchors: list = field(default_factory=list)
    fast: bool = True


class ClassifyEngine:
    def __init__(self, idx, opts: Options | None = None):
        self.idx = idx
        self.opts = opts or Options()
        self.fm = FM(idx)
        self.loc = Locator(idx)
        self.q_mem, self.q_lv = mapq_tables(len(idx.ref_bin) * 4)
        self.state = StreamState()

    def classify_read(self, name: str, seq: str, qual: str | None = None) -> ReadResult:
        res = ReadResult(name, seq, qual, len(seq))
        if len(seq) < MIN_READ_LEN:
            return res
        idx, fm, loc = self.idx, self.fm, self.loc
        q_mem, q_lv = self.q_mem, self.q_lv
        dirs, both = get_islands(seq, idx)
        anchors, chains = res.anchors, res.chains
        super_repeat = fast_classify(idx, fm, loc, q_mem, q_lv, dirs[0],
                                     res.read_len, anchors)
        if both:
            super_repeat += fast_classify(idx, fm, loc, q_mem, q_lv, dirs[1],
                                          res.read_len, anchors)
        resolve_tree(anchors, chains)
        run_slow = False
        if not chains:
            run_slow = True
        elif chains[0].anchor_number < 5 and super_repeat < 3:
            run_slow = True
            if res.read_len <= 300 and chains[0].sum_score > 200:
                run_slow = False
        if run_slow:
            anchors.clear()
            res.fast = False
            slow_classify(idx, fm, loc, q_mem, q_lv, dirs[0], res.read_len, anchors)
            resolve_tree(anchors, chains)
            if both or not chains or (chains[0].anchor_number < 5 and super_repeat < 3):
                slow_classify(idx, fm, loc, q_mem, q_lv, dirs[1], res.read_len, anchors)
                resolve_tree(anchors, chains)
        delete_small_score_rst(idx, chains, dirs, res.read_len, self.state,
                               self.opts)
        detect_primary(chains, res.read_len)
        return res
