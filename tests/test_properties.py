"""Hypothesis property tests — pure Python (no Spark session), so each
example is microseconds and hypothesis can explore widely.

Covers invariants that golden vectors can't: the union-find shortcut
against an independent BFS reference on arbitrary graphs, and the
reference-quirk kernel algebra on arbitrary token lists.
"""

from collections import defaultdict, deque

from hypothesis import given, settings
from hypothesis import strategies as st

node = st.integers(min_value=0, max_value=40)
edges_strategy = st.lists(st.tuples(node, node), max_size=120)
tokens = st.lists(st.text(alphabet="abcdef", min_size=1, max_size=4), max_size=12)


def _bfs_components(edges):
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    label = {}
    for start in adj:
        if start in label:
            continue
        comp = {start}
        q = deque([start])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in comp:
                    comp.add(v)
                    q.append(v)
        root = min(comp)
        for v in comp:
            label[v] = root
    return label


@settings(max_examples=300, deadline=None)
@given(edges_strategy)
def test_union_find_matches_bfs(edges):
    from serimi_rdf_interlinking_spark.operators.graph import (
        _union_find_local,
    )

    assert _union_find_local(edges) == _bfs_components(edges)


@settings(max_examples=300, deadline=None)
@given(tokens, tokens)
def test_jaccard_tokens_bounds_and_symmetry(x, y):
    from serimi_rdf_interlinking_spark.functions.kernels import (
        jaccard_tokens,
    )

    j = jaccard_tokens(x, y)
    assert 0.0 <= j <= 1.0
    assert j == jaccard_tokens(y, x)
    assert jaccard_tokens(x, x) == 1.0


@settings(max_examples=300, deadline=None)
@given(tokens, tokens)
def test_hm_kernel_reference_algebra(x, y):
    """SetSim hm: 0 iff the unique intersection is empty; otherwise the
    exact subtractive Tversky form with the reference's multiplicity
    denominator (betha2 = 1/(|x|+|y|) WITH duplicates)."""
    from serimi_rdf_interlinking_spark.functions.kernels import (
        _unique_intersection_size,
        hm,
    )

    v = hm(x, y, c=1.0)
    inter = _unique_intersection_size(x, y)
    if inter == 0:
        assert v == 0.0
    else:
        uniq_y_minus_x = len(set(y) - set(x))
        expected = inter - uniq_y_minus_x / (len(x) + len(y))
        assert abs(v - expected) < 1e-12
        # with a nonempty intersection the score is strictly positive:
        # the subtracted term is < 1 <= inter
        assert v > 0.0


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=20), st.text(max_size=20))
def test_asm_bounded(a, b):
    """ASM stays in [0,1] on ARBITRARY text. No symmetry assertion
    here: the reference's xmatch_with_expansion is genuinely
    ASYMMETRIC when single-char tokens trigger initials expansion —
    the expansion applies to side a preferentially
    (extension_module: `elsif aa.size > 0` before the b-side branch),
    so e.g. asm('a', '0 a0') != asm('0 a0', 'a'). Hypothesis found
    this; the port reproduces it faithfully."""
    from serimi_rdf_interlinking_spark.functions.kernels import (
        advanced_string_matching,
    )

    s = advanced_string_matching(a, b)
    assert 0.0 <= s <= 1.0 + 1e-9


_word = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=2, max_size=6)
_phrase = st.lists(_word, min_size=0, max_size=4).map(" ".join)


@settings(max_examples=200, deadline=None)
@given(_phrase, _phrase)
def test_asm_symmetric_without_initials(a, b):
    """With no single-char tokens (and <= 4 tokens/side) the initials
    expansion never fires and every constituent metric is symmetric —
    so ASM is symmetric on this regime."""
    from serimi_rdf_interlinking_spark.functions.kernels import (
        advanced_string_matching,
    )

    assert advanced_string_matching(a, b) == advanced_string_matching(b, a)
