"""Registry family modules — importing a module registers its queries
into registries.base.REGISTRY; registry.py imports them all and then
applies the driver-window ordering."""
