#!/usr/bin/env python3
"""Generate kmer.srt (sorted unique fwd-strand 31-mers) from a FASTA, replacing jellyfish+kmersort."""
import sys, numpy as np

def read_fasta(path):
    name, seq = None, []
    with open(path) as f:
        for line in f:
            line = line.rstrip()
            if line.startswith('>'):
                if name is not None:
                    yield name, ''.join(seq)
                name, seq = line[1:], []
            else:
                seq.append(line)
    if name is not None:
        yield name, ''.join(seq)

K = 31
LUT = np.full(256, 4, dtype=np.uint8)
for i, c in enumerate('ACGT'):
    LUT[ord(c)] = i
    LUT[ord(c.lower())] = i

def kmers_of_seq(s):
    b = LUT[np.frombuffer(s.encode(), dtype=np.uint8)]
    valid = b < 4
    n = len(b)
    if n < K:
        return np.empty(0, dtype=np.uint64)
    # rolling kmer via cumulative shifts: use stride trick on windows of validity
    # window valid iff all K bases valid
    vi = valid.astype(np.int32)
    cs = np.concatenate([[0], np.cumsum(vi)])
    win_ok = (cs[K:] - cs[:-K]) == K
    if not win_ok.any():
        return np.empty(0, dtype=np.uint64)
    # compute kmer values: for each window start i, sum b[i+j] << 2*(K-1-j)
    vals = np.zeros(n - K + 1, dtype=np.uint64)
    bb = b.astype(np.uint64)
    for j in range(K):
        vals |= (bb[j:n - K + 1 + j] << np.uint64(2 * (K - 1 - j)))
    return vals[win_ok]

def main():
    fa, out = sys.argv[1], sys.argv[2]
    allk = []
    for name, seq in read_fasta(fa):
        allk.append(kmers_of_seq(seq))
    ks = np.unique(np.concatenate(allk))
    with open(out, 'wb') as f:
        np.array([len(ks)], dtype=np.uint64).tofile(f)
        ks.tofile(f)
    print(f"{len(ks)} unique 31-mers", file=sys.stderr)

main()
