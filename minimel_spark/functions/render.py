"""X7: prediction-vs-gold diff rendering (reference app/app.py:54-127).

The reference demo paints each text with its predicted and gold entity links
as HTML anchors — true positives (``tp``) where an overlap-component of
mentions agrees exactly, otherwise the predictions (``fp``) and gold labels
(``fn``) side by side as ``[preds / golds]``. Re-expressed from scratch as a
pure function over explicit match dicts so it works on any (text, preds,
golds) rows (e.g. straight off the evaluation DataFrames) without the demo
app's matcher plumbing.

Determinism delta (same class as the extraction notes): the reference
iterates ``set``s when emitting anchors, inheriting the per-process hash
seed; spans here are emitted in sorted order, so the rendering is stable
across runs and executors.
"""

from __future__ import annotations

Span = tuple[int, int]
Match = tuple[str, int]  # (surface, qid)


def _components(spans: list[Span]) -> list[tuple[list[Span], int]]:
    """Group overlapping spans (app.py:71-84): a component grows while the
    next span starts before the running max end."""
    comps: list[tuple[list[Span], int]] = []
    cur: list[Span] = []
    cur_end = 0
    for s in sorted(spans):
        if cur and s[0] < cur_end:
            cur.append(s)
            cur_end = max(cur_end, s[1])
        else:
            if cur:
                comps.append((cur, cur_end))
            cur, cur_end = [s], s[1]
    if cur:
        comps.append((cur, cur_end))
    return comps


def _anchor(cls: str, name: str, qid: int) -> str:
    return f'<a class="{cls}" href="https://www.wikidata.org/wiki/Q{qid}">{name}</a>'


def render_diff(
    text: str,
    preds: dict[Span, Match],
    golds: dict[Span, Match] | None = None,
) -> str:
    """Render one text with tp/fp/fn anchors (app.py:86-127 semantics)."""
    golds = golds or {}
    spans = sorted(set(preds) | set(golds))
    out: list[str] = []
    offset = 0
    for comp, comp_end in _components(spans):
        comp_start = comp[0][0]
        p = {sp: preds[sp] for sp in comp if sp in preds}
        g = {sp: golds[sp] for sp in comp if sp in golds}
        out.append(text[offset:comp_start])
        if p == g:
            # exact agreement: every link is a true positive
            for sp in sorted(g):
                out.append(_anchor("tp", *g[sp]))
        else:
            both = bool(p) and bool(g)
            if both:
                out.append("[")
            sub = comp_start
            for sp in sorted(p):
                name, qid = p[sp]
                out.append(text[sub : sp[0]])
                out.append(_anchor("fp", name, qid))
                sub = sp[0] + len(name)
            if both:
                out.append(text[sub:comp_end] + " / ")
            sub = comp_start
            for sp in sorted(g):
                name, qid = g[sp]
                out.append(text[sub : sp[0]])
                out.append(_anchor("fn", name, qid))
                sub = sp[0] + len(name)
            if both:
                out.append(text[sub:comp_end] + "]")
        offset = comp_end
    out.append(text[offset:])
    return "".join(out)
