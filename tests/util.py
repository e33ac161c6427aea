"""Shared helpers for tests: build layouts from toy graphs, map ranks back
to toy node ids."""

from __future__ import annotations

import os

import ray.data

from cassovary_ray.corpus import (
    TOY_GRAPHS,
    graph_to_edges,
    graph_vertices,
    node_vertex_id,
    pages_table_for_graph,
)
from cassovary_ray.extract import pages_to_edges, pages_to_vertices
from cassovary_ray.layout import build_edge_layout

import pyarrow as pa


def edges_ds_for_graph(adj):
    """Edge Dataset with raw toy node ids (no url hashing)."""
    return ray.data.from_arrow(graph_to_edges(adj))


def vertices_ds_for_graph(adj):
    return ray.data.from_arrow(
        pa.table({"vertex": pa.array(graph_vertices(adj), pa.int64())})
    )


def build_toy_layout(adj, layout_dir, num_parts, **kwargs):
    """Layout straight from a toy adjacency (raw int ids)."""
    return build_edge_layout(
        edges_ds_for_graph(adj),
        layout_dir,
        num_parts,
        vertices_ds=vertices_ds_for_graph(adj),
        **kwargs,
    )


def build_pages_layout(adj, layout_dir, num_parts, **kwargs):
    """Layout via the full pages → extract → hash pipeline (url-hashed ids)."""
    pages = ray.data.from_arrow(pages_table_for_graph(adj))
    return build_edge_layout(
        pages_to_edges(pages),
        layout_dir,
        num_parts,
        vertices_ds=pages_to_vertices(pages),
        **kwargs,
    )


def state_by_node(result_df, adj, value_col, hashed=False):
    """Result DataFrame (vertex, value) → {toy node id: value}."""
    key = (lambda n: node_vertex_id(n)) if hashed else (lambda n: n)
    lookup = dict(zip(result_df["vertex"], result_df[value_col]))
    return {n: lookup[key(n)] for n in graph_vertices(adj)}
