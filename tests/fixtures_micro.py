"""Hand-built micro-graph fixtures for differential tests.

A 6-node spliced pangenome in the style of the documented tag vocabulary
(reference ``docs/README.md``), plus a GAF exercising every branch of the
augmenter semantics: perfect matches, substitutions, deletions, insertions,
reverse walks, mapq/unplaced/divergence filters, 2-op clipping, early cs
exhaustion, pure-indel node drops, leading-substitution compaction, and
novel edges.
"""

MICRO_GFA = """H\tVN:Z:1.1
S\t1\tACGTACGT\tLN:i:8\tEX:Z:T1_R1.1
S\t2\tAC\tEX:Z:T1_R1.1,T2_R1.1
S\t3\tGTTT\tEX:Z:T1_R1.2
S\t4\tTTACG\tEX:Z:T1_R1.2,T2_R1.2
S\t5\tCCCC
S\t6\tGGAGGA\tEX:Z:T1_R1.3,T2_R1.2
L\t1\t+\t2\t+\t*
L\t2\t+\t3\t+\t*\tJN:Z:T1_R1.1.2
L\t2\t+\t5\t+\t*
L\t5\t+\t4\t+\t*
L\t2\t+\t4\t+\t*\tJN:Z:T2_R1.1.2
L\t3\t+\t4\t+\t*
L\t4\t+\t6\t+\t*\tJN:Z:T1_R1.2.3
P\tT1_R1\t1+,2+,3+,4+,6+\t*
P\tT2_R1\t1+,2+,4+,6+\t*
"""

# node lengths: 1:8 2:2 3:4 4:5 5:4 6:6
MICRO_GAF_LINES = [
    # perfect forward 3-node match
    "r1\t9\t0\t9\t+\t>1>2>3\t14\t2\t10\t9\t9\t60\tcs:Z::9\tdv:f:0.0",
    # substitution inside first node
    "r2\t9\t0\t9\t+\t>1>2>3\t14\t2\t10\t8\t9\t60\tcs:Z::3*ac:5\tdv:f:0.01",
    # deletion ending first node (OL offset arithmetic)
    "r3\t7\t0\t7\t+\t>1>2>3\t14\t2\t10\t7\t9\t60\tcs:Z::4-ca:3\tdv:f:0.02",
    # insertion consuming path span (reference quirk), leftover cs ops
    "r4\t12\t0\t12\t+\t>1>2>3\t14\t2\t10\t9\t12\t60\tcs:Z::3+acg:6\tdv:f:0.0",
    # reverse walk, last node span 0 (skipped node)
    "r5\t10\t0\t10\t+\t<6<4<2\t13\t1\t10\t10\t10\t60\tcs:Z::10\tdv:f:0.0",
    # rejected: mapq below threshold
    "r6\t9\t0\t9\t+\t>1>2\t10\t0\t9\t9\t9\t5\tcs:Z::9\tdv:f:0.0",
    # skipped: unplaced
    "r7\t10\t0\t10\t+\t*\t0\t0\t0\t0\t0\t60\tdv:f:0.0",
    # skipped: divergence too high
    "r8\t9\t0\t9\t+\t>1>2\t10\t2\t9\t9\t9\t60\tcs:Z::8\tdv:f:0.25",
    # novel edge 3->5
    "r9\t6\t0\t6\t+\t>3>5\t8\t0\t7\t6\t6\t60\tcs:Z::8\tdv:f:0.0",
    # clipped leading insertion (start shifted past node 2)
    "r10\t8\t0\t8\t+\t>2>3\t6\t0\t5\t5\t8\t60\tcs:Z:+acg:5\tdv:f:0.0",
    # clipped trailing insertion, early cs exhaustion mid-walk
    "r11\t8\t0\t8\t+\t>2>3\t6\t0\t5\t5\t8\t60\tcs:Z::5+aa\tdv:f:0.0",
    # node 2 fully deleted -> dropped, novel edge 1->3
    "r12\t7\t0\t7\t+\t>1>2>3\t14\t2\t10\t7\t9\t60\tcs:Z::6-gt:1\tdv:f:0.0",
    # node 2 starts with a substitution (leading-* compaction)
    "r13\t9\t0\t9\t+\t>1>2>3\t14\t2\t10\t8\t9\t60\tcs:Z::6*ac:2\tdv:f:0.0",
    # reverse with deletion at entry of middle node
    "r14\t8\t0\t8\t+\t<6<4<2\t13\t1\t10\t8\t10\t60\tcs:Z::5-ag:3\tdv:f:0.0",
    # node 2 compacts to a full-node deletion via leading '*' absorption:
    # OL offset becomes -1 (reference quirk; regression for slot layouts)
    "r15\t8\t0\t8\t+\t>1>2>3\t14\t2\t10\t7\t9\t60\tcs:Z::6*ca-t:1\tdv:f:0.0",
]

MICRO_GAF = "\n".join(MICRO_GAF_LINES) + "\n"


def write_micro(tmpdir):
    """Write the fixtures into tmpdir; returns (gfa_path, gaf_path)."""
    gfa = tmpdir / "micro.gfa"
    gaf = tmpdir / "micro.gaf"
    gfa.write_text(MICRO_GFA)
    gaf.write_text(MICRO_GAF)
    return str(gfa), str(gaf)
