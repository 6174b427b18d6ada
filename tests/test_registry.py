"""Registry invariants: the driver-evidence rotation must stay
consistent with the registered query set."""


def test_driver_priority_names_all_exist():
    """Every _DRIVER_PRIORITY entry must name a registered query (a
    typo here silently burns a driver CORRECTNESS slot).  Rows-only
    names are allowed in the window only once no never-driver-green
    oracle-backed query waits OUTSIDE it (the round-9 endgame: the 11
    rows-only queries fill the window's spare slots so the driver
    records their clean runs) — tools/verify_round.py enforces the
    same rule against the committed CORRECTNESS history."""
    from go_otel_clickhouse_ingestor_spark import registry

    reg = registry.load_all()
    missing = [n for n in registry._DRIVER_PRIORITY if n not in reg]
    assert not missing, f"priority names not in registry: {missing}"
    # Oracle-backed names must come FIRST: a rows-only name ahead of an
    # oracle-backed one would burn a hash-verifiable slot as no_oracle.
    kinds = [reg[n].oracle is None for n in registry._DRIVER_PRIORITY]
    first_rows_only = kinds.index(True) if True in kinds else len(kinds)
    misordered = [
        n
        for n, is_rows_only in zip(
            registry._DRIVER_PRIORITY[first_rows_only:],
            kinds[first_rows_only:],
        )
        if not is_rows_only
    ]
    assert not misordered, (
        f"oracle-backed priority names listed AFTER rows-only ones "
        f"(would be displaced out of the window): {misordered}"
    )
