"""Registry invariants: the driver-evidence rotation must stay
consistent with the registered query set."""


def test_driver_priority_names_all_exist():
    """Every _DRIVER_PRIORITY entry must name a registered query (a
    typo here silently burns a driver CORRECTNESS slot) and every
    priority name must carry an oracle (rows-only queries waste window
    slots as no_oracle)."""
    from go_otel_clickhouse_ingestor_spark import registry

    reg = registry.load_all()
    missing = [n for n in registry._DRIVER_PRIORITY if n not in reg]
    assert not missing, f"priority names not in registry: {missing}"
    no_oracle = [
        n for n in registry._DRIVER_PRIORITY if reg[n].oracle is None
    ]
    assert not no_oracle, f"rows-only queries in the driver window: {no_oracle}"
