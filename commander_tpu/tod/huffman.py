"""Huffman coding for Commander TOD archives: numpy encoder + native decoder.

Format compatibility with the reference tooling
(commander_tools/tod_tools/huffman.py) and the Fortran decoder
(comm_huffman_mod.f90): tree serialized as [node_max, left..., right...],
symbols as the leaf-value array, bitstream with a leading padding byte.
Encoding is host-side prep tooling (numpy is fine); decoding is the hot
load path and runs in C++ (native/huffman.cpp) with a pure-Python fallback.
"""
from __future__ import annotations

import heapq
import itertools
import subprocess

import numpy as np


def build_tree(values: np.ndarray):
    """Huffman tree for the value distribution. Returns (tree, symbols):
    tree = int64 array [node_max, left..., right...], symbols = leaf values,
    matching the reference's serialization (huffman.py GenerateCode)."""
    vals, counts = np.unique(np.asarray(values, np.int64), return_counts=True)
    nsymb = len(vals)
    counter = itertools.count(1)
    # entries: (weight, tiebreak, node_id, left_id, right_id)
    heap = [(int(c), next(counter), i + 1, 0, 0)
            for i, c in enumerate(counts)]
    heapq.heapify(heap)
    next_id = nsymb + 1
    left, right = [], []
    if nsymb == 1:
        # degenerate: single symbol; make a 1-level tree pointing twice
        left, right = [1], [1]
        return np.asarray([2, 1, 1], np.int64), vals
    while len(heap) > 1:
        w1, _, n1, _, _ = heapq.heappop(heap)
        w2, _, n2, _, _ = heapq.heappop(heap)
        left.append(n1)
        right.append(n2)
        heapq.heappush(heap, (w1 + w2, next(counter), next_id, n1, n2))
        next_id += 1
    node_max = next_id - 1
    tree = np.concatenate([[node_max], left, right]).astype(np.int64)
    return tree, vals


def _codes_from_tree(tree: np.ndarray, symbols: np.ndarray):
    node_max = int(tree[0])
    nsymb = len(symbols)
    n_int = (len(tree) - 1) // 2
    left = tree[1:1 + n_int]
    right = tree[1 + n_int:]
    codes = {}

    def walk(node, code):
        if node <= nsymb:
            codes[int(symbols[node - 1])] = code
            return
        walk(int(left[node - nsymb - 1]), code + "0")
        walk(int(right[node - nsymb - 1]), code + "1")

    walk(node_max, "")
    return codes


def encode(values: np.ndarray, tree: np.ndarray, symbols: np.ndarray) -> bytes:
    """Encode int values with the tree (reference byteCode format)."""
    codes = _codes_from_tree(tree, symbols)
    bits = "".join(codes[int(v)] for v in np.asarray(values, np.int64))
    padding = 8 - len(bits) % 8
    bits += "0" * padding
    by = bytearray([padding])
    for i in range(0, len(bits), 8):
        by.append(int(bits[i:i + 8], 2))
    return bytes(by)


def decode(data: bytes, tree: np.ndarray, symbols: np.ndarray,
           n_expected: int | None = None, use_native: bool = True) -> np.ndarray:
    """Decode a bitstream; returns int64 symbol array (pre-cumsum)."""
    tree = np.ascontiguousarray(tree, np.int64)
    symbols = np.ascontiguousarray(symbols, np.int64)
    node_max = int(tree[0])
    nsymb = len(symbols)
    n_int = (len(tree) - 1) // 2
    left = np.ascontiguousarray(tree[1:1 + n_int])
    right = np.ascontiguousarray(tree[1 + n_int:])
    buf = np.frombuffer(bytes(data), np.uint8)
    max_out = n_expected if n_expected is not None else len(buf) * 8
    if use_native:
        try:
            from ..native import lib
            import ctypes
            L = lib()
            out = np.empty(max_out, np.int64)
            i64p = ctypes.POINTER(ctypes.c_longlong)
            u8p = ctypes.POINTER(ctypes.c_ubyte)
            n = L.huffman_decode(
                left.ctypes.data_as(i64p), right.ctypes.data_as(i64p),
                node_max, nsymb, symbols.ctypes.data_as(i64p),
                buf.ctypes.data_as(u8p), len(buf),
                out.ctypes.data_as(i64p), max_out)
            if n < 0:
                raise ValueError("native huffman decode failed (bad stream)")
            return out[:n]
        except (OSError, subprocess.CalledProcessError):
            pass
    # pure-Python fallback (slow; tests and emergencies)
    padding = buf[0]
    bits = np.unpackbits(buf[1:])
    if padding:
        bits = bits[:-int(padding)]
    out = []
    node = node_max
    for b in bits:
        node = int(right[node - nsymb - 1] if b else left[node - nsymb - 1])
        if node <= nsymb:
            out.append(int(symbols[node - 1]))
            node = node_max
    return np.asarray(out, np.int64)
