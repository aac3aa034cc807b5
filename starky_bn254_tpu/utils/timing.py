"""Hierarchical phase timing — the TPU-side analogue of plonky2's TimingTree
(the reference passes one into every prove call, e.g. src/fields/fq/exp.rs:618,
but records nothing; here timings are collected and queryable).

Usage:
    tt = TimingTree("prove")
    with tt.scope("commit"):
        ...
    print(tt.render())
    tt.as_dict()  # for structured logging / bench JSON
"""

from __future__ import annotations

import time
from contextlib import contextmanager


class _Node:
    def __init__(self, name: str):
        self.name = name
        self.elapsed = 0.0
        self.children: list[_Node] = []


class TimingTree:
    def __init__(self, name: str = "root"):
        self.root = _Node(name)
        self._stack = [self.root]
        self._t0 = time.time()

    @contextmanager
    def scope(self, name: str):
        node = _Node(name)
        self._stack[-1].children.append(node)
        self._stack.append(node)
        t0 = time.time()
        try:
            yield
        finally:
            node.elapsed = time.time() - t0
            self._stack.pop()

    def finish(self):
        self.root.elapsed = time.time() - self._t0

    def render(self) -> str:
        if self.root.elapsed == 0.0:
            self.finish()
        lines: list[str] = []

        def walk(node: _Node, depth: int):
            lines.append(f"{'  ' * depth}{node.elapsed * 1e3:9.1f}ms  {node.name}")
            for c in node.children:
                walk(c, depth + 1)

        walk(self.root, 0)
        return "\n".join(lines)

    def as_dict(self) -> dict:
        if self.root.elapsed == 0.0:
            self.finish()

        def walk(node: _Node):
            d = {"name": node.name, "ms": round(node.elapsed * 1e3, 2)}
            if node.children:
                d["children"] = [walk(c) for c in node.children]
            return d

        return walk(self.root)
