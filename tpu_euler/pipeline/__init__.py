from tpu_euler.pipeline.assemble import assemble_reads, AssemblyResult  # noqa: F401
