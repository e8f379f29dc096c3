"""Sharding: device meshes, halo exchange, distributed scans."""
