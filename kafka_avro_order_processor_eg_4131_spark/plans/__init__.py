# Query plan modules; each registers its queries into catalog.REGISTRY.
