"""ECS tests (port of reference tests/ecs_test.cpp behavior: group queries
update on component add/remove)."""

from granite_tpu.scene.ecs import EntityPool


class A:
    def __init__(self, v=0):
        self.v = v


class B:
    def __init__(self, v=0):
        self.v = v


class C:
    pass


def test_group_query_basics():
    pool = EntityPool()
    e1 = pool.create_entity()
    e2 = pool.create_entity()
    e3 = pool.create_entity()
    e1.allocate_component(A, 1)
    e1.allocate_component(B, 10)
    e2.allocate_component(A, 2)
    e3.allocate_component(B, 30)

    ab = pool.get_component_group(A, B)
    assert len(ab) == 1 and ab[0][1].v == 1 and ab[0][2].v == 10
    a_only = pool.get_component_group(A)
    assert sorted(x[1].v for x in a_only) == [1, 2]


def test_group_updates_on_add_remove():
    pool = EntityPool()
    e1 = pool.create_entity()
    e1.allocate_component(A)
    assert len(pool.get_component_group(A, B)) == 0
    e1.allocate_component(B)
    assert len(pool.get_component_group(A, B)) == 1
    e1.free_component(A)
    assert len(pool.get_component_group(A, B)) == 0
    assert len(pool.get_component_group(B)) == 1


def test_delete_entity_removes_from_groups():
    pool = EntityPool()
    es = [pool.create_entity() for _ in range(4)]
    for e in es:
        e.allocate_component(A)
        e.allocate_component(C)
    assert len(pool.get_component_group(A, C)) == 4
    pool.delete_entity(es[1])
    assert len(pool.get_component_group(A, C)) == 3
    assert len(pool) == 3


def test_component_replacement_keeps_single_entry():
    pool = EntityPool()
    e = pool.create_entity()
    e.allocate_component(A, 1)
    e.allocate_component(A, 2)     # replace, not duplicate
    g = pool.get_component_group(A)
    assert len(g) == 1 and g[0][1].v == 2
