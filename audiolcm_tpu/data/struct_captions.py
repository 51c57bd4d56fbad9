"""Structured-caption parsing for order-conditioned models.

Behavior parity: `ldm/modules/encoders/modules.py:342-475`
(FrozenCLAPOrderEmbedder2/3): a struct caption like
  '<man speaking& order 1 start>@<idle engine& all>'
is split on '@' into `<obj& order>` chunks; objects are joined with ' | '
(a '|' after every object) for tokenization, and orders are mapped to
integer labels with either the full (order x time) table (Embedder2,
10 orders x start/mid/end + all + unknown) or the time-only table
(Embedder3: all/start/mid/end).

Pure host-side string work; the outputs feed models/order_dit.py's index
builders.
"""

from __future__ import annotations

from typing import Dict, List, Tuple


def build_order_dict(time_only: bool = False) -> Dict[str, int]:
    if time_only:
        return {t: i for i, t in enumerate(["all", "start", "mid", "end"])}
    order2label: Dict[str, int] = {}
    time_stamps = ["start", "mid", "end"]
    for i in range(10):
        for j, ts in enumerate(time_stamps):
            order2label[f"order {i} {ts}"] = i * len(time_stamps) + j
    order2label["all"] = 10 * len(time_stamps)
    order2label["unknown"] = 10 * len(time_stamps) + 1
    return order2label


def parse_struct_caption(
    raw: str, order_to_label: Dict[str, int]
) -> Tuple[str, List[int]]:
    """'<obj& order>@<obj2& order2>' -> ('obj | obj2 |', [label, label2])."""
    objs: List[str] = []
    orders: List[int] = []
    for chunk in raw.split("@"):
        chunk = chunk.strip()
        if chunk.startswith("<") and chunk.endswith(">"):
            chunk = chunk[1:-1]
        obj, order = chunk.split("&")
        objs.append(obj.strip())
        orders.append(order_to_label.get(order.strip(), order_to_label.get("unknown", 0)))
    return " | ".join(objs) + " |", orders


def parse_struct_captions(
    raws: List[str], time_only: bool = False
) -> Tuple[List[str], List[List[int]]]:
    table = build_order_dict(time_only)
    texts, orders = [], []
    for raw in raws:
        text, order = parse_struct_caption(raw, table)
        texts.append(text)
        orders.append(order)
    return texts, orders
