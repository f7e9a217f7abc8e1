"""Index state: segment file formats, manifest/lineage, shard
searchers (actor-pool payload) and the query engine facade."""
