"""Ray Data batch transforms: stateless functions and actor-pool classes
passed to ``Dataset.map_batches`` / ``groupby().map_groups``."""
