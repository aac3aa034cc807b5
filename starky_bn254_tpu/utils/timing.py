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
    def __init__(self, name: str = "root", sync: bool = False):
        """sync=True inserts a device barrier (jax.effects_barrier) when a
        scope closes, so phase times attribute asynchronously-dispatched
        device work to the phase that launched it instead of to whichever
        later phase first blocks (JAX dispatch is async; without the
        barrier a multi-second commit can read as ~2ms)."""
        self.root = _Node(name)
        self._stack = [self.root]
        self._t0 = time.time()
        self._sync = sync
        self._seq = 0

    def _barrier(self):
        if self._sync:
            import jax.numpy as jnp
            import numpy as np

            from ..xnp import hard_sync

            # device streams execute in-order: a trivial op enqueued now
            # completes only after everything dispatched before it
            # (hard_sync: block_until_ready alone does not actually wait
            # over the tunneled-TPU transport). The op takes a fresh host
            # scalar each call so a constant-folding/buffer-caching runtime
            # can never serve it without executing on the stream (ADVICE r3:
            # a cached jnp.zeros fill would silently stop barriering).
            self._seq += 1
            hard_sync(jnp.full((1,), np.uint32(self._seq)) + jnp.uint32(1))

    @contextmanager
    def scope(self, name: str):
        self._barrier()
        node = _Node(name)
        self._stack[-1].children.append(node)
        self._stack.append(node)
        t0 = time.time()
        try:
            yield
        finally:
            self._barrier()
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
