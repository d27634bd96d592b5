from swtpu.models.assembly import assemble_greedy, make_reads  # noqa: F401
