"""Text-pipeline operator unit tests (registry coverage handles the
full-query oracles; these exercise edge cases directly)."""

import pyarrow as pa


def test_connected_components_chain_and_singletons(ray_session):
    """A long chain needs multiple propagation rounds (diameter 7), and
    pairless nodes must come out as singleton clusters."""
    import ray.data

    from geofileops_ray.textops.dedup import connected_components

    pairs = ray.data.from_arrow(
        pa.table(
            {
                # chain 1-2-3-4-5-6-7-8, triangle 20-21-22, pair 30-31
                "doc_id_a": pa.array(
                    [1, 2, 3, 4, 5, 6, 7, 20, 21, 20, 30], pa.int64()
                ),
                "doc_id_b": pa.array(
                    [2, 3, 4, 5, 6, 7, 8, 21, 22, 22, 31], pa.int64()
                ),
            }
        )
    )
    nodes = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(list(range(1, 9)) + [20, 21, 22, 30, 31, 99],
                                pa.int64())}
        )
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs, nodes).take_all()
    }
    assert {k: got[k] for k in range(1, 9)} == {k: 1 for k in range(1, 9)}
    assert got[20] == got[21] == got[22] == 20
    assert got[30] == got[31] == 30
    assert got[99] == 99
