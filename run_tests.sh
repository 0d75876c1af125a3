#!/bin/sh
# Unit tests run on CPU (8 virtual devices for sharding coverage).
#
# PALLAS_AXON_POOL_IPS is blanked because this image's sitecustomize claims a
# (single-tenant, remote) TPU session in every python process when it is set;
# concurrent/CPU-only runs would serialize behind the tunnel for minutes.
# TPU work (bench.py) keeps the ambient environment and must be the only jax
# process alive while it runs.
exec env PALLAS_AXON_POOL_IPS= python -m pytest tests/ -q "$@"
