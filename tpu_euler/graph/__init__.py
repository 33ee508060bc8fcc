from tpu_euler.graph.build import DeBruijnGraph, build_graph  # noqa: F401
