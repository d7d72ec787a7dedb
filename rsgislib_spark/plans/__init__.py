"""Plan-level services: lineage records, checkpointed (resumable) runs."""
