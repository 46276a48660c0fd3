"""Stateful engine components: membership filters + sharded actors."""
