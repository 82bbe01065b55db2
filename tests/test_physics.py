"""Physics system tests (reference scope: physics/physics_system.cpp;
the reference has no dedicated physics unit tests — these lock the
behaviors its API contract implies: resting contact, restitution,
raycasts, events, constraints, character control)."""

import numpy as np
import pytest

from granite_tpu.event.manager import EventManager
from granite_tpu.physics import (Box, CollisionEvent, CollisionMesh,
                                 ConvexMeshPart, ForceComponent,
                                 InteractionType, MaterialInfo, MeshType,
                                 PhysicsComponent, PhysicsSystem, Posed,
                                 Sphere, gjk_distance)
from granite_tpu.scene.ecs import EntityPool
from granite_tpu.scene.scene import Scene


def make_world():
    sys_ = PhysicsSystem()
    scene = Scene()
    sys_.set_scene(scene)
    floor = sys_.add_infinite_plane(
        [0.0, 1.0, 0.0, 0.0],
        MaterialInfo(type=InteractionType.Static, friction=0.8))
    return sys_, scene, floor


def run(sys_, seconds, dt=1 / 60):
    for _ in range(int(round(seconds / dt))):
        sys_.iterate(dt)


# -- GJK/EPA -----------------------------------------------------------------

def test_gjk_sphere_sphere_distance():
    ident = np.array([1.0, 0, 0, 0])
    a = Posed(Sphere(1.0), np.array([0.0, 0, 0]), ident)
    b = Posed(Sphere(1.0), np.array([3.0, 0, 0]), ident)
    dist, pa, pb, n = gjk_distance(a, b)
    assert abs(dist - 1.0) < 1e-6
    np.testing.assert_allclose(pa, [1, 0, 0], atol=1e-5)
    np.testing.assert_allclose(pb, [2, 0, 0], atol=1e-5)
    np.testing.assert_allclose(n, [-1, 0, 0], atol=1e-5)


def test_gjk_box_box_overlap_epa():
    from granite_tpu.physics import epa_penetration
    ident = np.array([1.0, 0, 0, 0])
    a = Posed(Box((1, 1, 1)), np.array([0.0, 0, 0]), ident)
    b = Posed(Box((1, 1, 1)), np.array([1.5, 0, 0]), ident)
    dist, *_ = gjk_distance(a, b)
    assert dist == 0.0
    depth, n, _p = epa_penetration(a, b)
    assert abs(depth - 0.5) < 1e-5
    assert abs(abs(n[0]) - 1.0) < 1e-5


# -- dynamics ----------------------------------------------------------------

def test_sphere_falls_and_rests_on_plane():
    sys_, scene, _ = make_world()
    node = scene.create_node(translation=[0, 3.0, 0])
    h = sys_.add_sphere(node, MaterialInfo(mass=1.0, restitution=0.0))
    run(sys_, 2.5)
    b = sys_._bodies[h.index]
    # Rests with center ~radius above the plane (margin tolerance).
    assert abs(b.pos[1] - 1.0) < 0.05
    assert np.linalg.norm(b.linvel) < 0.1
    # Node transform synced.
    assert abs(scene.translation[node][1] - b.pos[1]) < 1e-5


def test_restitution_bounces():
    sys_, scene, _ = make_world()
    node = scene.create_node(translation=[0, 2.0, 0])
    h = sys_.add_sphere(node, MaterialInfo(
        mass=1.0, restitution=0.9, linear_damping=0.0))
    top = 0.0
    bounced = False
    for _ in range(240):
        sys_.iterate(1 / 60)
        y = sys_._bodies[h.index].pos[1]
        if sys_._bodies[h.index].linvel[1] > 0.5:
            bounced = True
        top = max(top, y)
    assert bounced


@pytest.mark.slow
def test_box_stack_settles():
    sys_, scene, _ = make_world()
    n0 = scene.create_node(translation=[0, 0.5, 0], scale=[0.5, 0.5, 0.5])
    n1 = scene.create_node(translation=[0.05, 1.55, 0],
                           scale=[0.5, 0.5, 0.5])
    h0 = sys_.add_cube(n0, MaterialInfo(mass=1.0, restitution=0.0,
                                        friction=0.9))
    h1 = sys_.add_cube(n1, MaterialInfo(mass=1.0, restitution=0.0,
                                        friction=0.9))
    run(sys_, 3.0)
    b0, b1 = sys_._bodies[h0.index], sys_._bodies[h1.index]
    assert abs(b0.pos[1] - 0.5) < 0.1
    assert 1.2 < b1.pos[1] < 1.8          # still stacked, not fallen off
    assert np.linalg.norm(b1.linvel) < 0.3


def test_static_and_kinematic_do_not_fall():
    sys_, scene, _ = make_world()
    ns = scene.create_node(translation=[0, 5.0, 0])
    nk = scene.create_node(translation=[3, 5.0, 0])
    hs = sys_.add_cube(ns, MaterialInfo(type=InteractionType.Static))
    hk = sys_.add_cube(nk, MaterialInfo(type=InteractionType.Kinematic))
    run(sys_, 1.0)
    assert sys_._bodies[hs.index].pos[1] == 5.0
    assert sys_._bodies[hk.index].pos[1] == 5.0
    assert PhysicsSystem.get_interaction_type(hk) == \
        InteractionType.Kinematic


def test_force_component_applies():
    EventManager.reset()
    sys_, scene, _ = make_world()
    pool = EntityPool()
    sys_.set_entity_pool(pool)
    node = scene.create_node(translation=[0, 5.0, 0])
    h = sys_.add_sphere(node, MaterialInfo(mass=1.0, linear_damping=0.0))
    e = pool.create_entity()
    e.allocate_component(PhysicsComponent, h)
    e.allocate_component(ForceComponent, linear_force=[50.0, 9.81, 0.0])
    sys_.iterate(1 / 60)
    b = sys_._bodies[h.index]
    assert b.linvel[0] > 0.5              # pushed +x
    assert abs(b.linvel[1]) < 0.2         # gravity cancelled


def test_collision_event_dispatched():
    EventManager.reset()
    sys_, scene, floor = make_world()
    node = scene.create_node(translation=[0, 1.5, 0])
    h = sys_.add_sphere(node, MaterialInfo(mass=1.0, restitution=0.0))
    PhysicsSystem.set_handle_parent(h, "ball-entity")
    got = []
    EventManager.get().register_handler(
        CollisionEvent, lambda ev: got.append(ev))
    run(sys_, 1.0)
    EventManager.get().dispatch()
    assert got, "no CollisionEvent for sphere-floor impact"
    ev = got[0]
    handles = {ev.get_first_handle(), ev.get_second_handle()}
    assert h in handles and floor in handles
    assert abs(abs(ev.get_world_normal()[1]) - 1.0) < 1e-3


def test_apply_impulse_and_velocity_api():
    sys_, scene, _ = make_world()
    node = scene.create_node(translation=[0, 5.0, 0])
    h = sys_.add_sphere(node, MaterialInfo(mass=2.0))
    sys_.set_linear_velocity(h, [1.0, 0, 0])
    sys_.apply_impulse(h, [2.0, 0, 0], [0, 5.0, 0])
    assert abs(sys_._bodies[h.index].linvel[0] - 2.0) < 1e-9
    sys_.set_angular_velocity(h, [0, 3.0, 0])
    assert sys_._bodies[h.index].angvel[1] == 3.0


# -- queries -----------------------------------------------------------------

def test_raycast_sphere_box_plane():
    sys_, scene, floor = make_world()
    ns = scene.create_node(translation=[0, 1.0, -5])
    sys_.add_sphere(ns, MaterialInfo(type=InteractionType.Static))
    nb = scene.create_node(translation=[4, 1.0, -5])
    sys_.add_cube(nb, MaterialInfo(type=InteractionType.Static))
    # ray hits the sphere front face
    r = sys_.query_closest_hit_ray([0, 1, 0], [0, 0, -1], 10.0)
    assert r and abs(r.t - 4.0) < 1e-3
    assert abs(r.world_normal[2] - 1.0) < 1e-2
    # ray hits the box
    r = sys_.query_closest_hit_ray([4, 1, 0], [0, 0, -1], 10.0)
    assert r and abs(r.t - 4.0) < 1e-3
    # ray straight down hits the plane
    r = sys_.query_closest_hit_ray([9, 2, 0], [0, -1, 0], 10.0)
    assert r and abs(r.t - 2.0) < 1e-6 and r.handle is floor
    # mask excludes statics
    from granite_tpu.physics import INTERACTION_TYPE_DYNAMIC_BIT
    r = sys_.query_closest_hit_ray([0, 1, 0], [0, 0, -1], 10.0,
                                   mask=INTERACTION_TYPE_DYNAMIC_BIT)
    assert not r


def test_raycast_triangle_mesh():
    sys_, scene, _ = make_world()
    mesh = CollisionMesh(
        indices=np.array([[0, 1, 2]], np.uint32),
        positions=np.array([[-1, 2, -3], [1, 2, -3], [0, 4, -3]],
                           np.float32))
    mid = sys_.register_collision_mesh(mesh)
    node = scene.create_node()
    sys_.add_mesh(node, mid, MaterialInfo(type=InteractionType.Static))
    r = sys_.query_closest_hit_ray([0, 3, 0], [0, 0, -1], 10.0)
    assert r and abs(r.t - 3.0) < 1e-6
    assert abs(r.world_normal[2] - 1.0) < 1e-6


def test_overlap_queries():
    sys_, scene, _ = make_world()
    n0 = scene.create_node(translation=[0, 1.0, 0])
    n1 = scene.create_node(translation=[1.5, 1.0, 0])
    n2 = scene.create_node(translation=[8.0, 1.0, 0])
    h0 = sys_.add_sphere(n0, MaterialInfo(type=InteractionType.Static))
    h1 = sys_.add_sphere(n1, MaterialInfo(type=InteractionType.Static))
    sys_.add_sphere(n2, MaterialInfo(type=InteractionType.Static))
    near = sys_.get_overlapping_objects(h0)
    assert h1 in near and len([h for h in near
                               if h.index != 0]) >= 1


@pytest.mark.slow
def test_ghost_area_no_response_but_events():
    EventManager.reset()
    sys_, scene, _ = make_world()
    na = scene.create_node(translation=[0, 1.0, 0], scale=[2, 2, 2])
    ha = sys_.add_cube(na, MaterialInfo(type=InteractionType.Area))
    nd = scene.create_node(translation=[0, 2.0, 0])
    hd = sys_.add_sphere(nd, MaterialInfo(mass=1.0, restitution=0.0))
    got = []
    EventManager.get().register_handler(
        CollisionEvent, lambda ev: got.append(ev))
    run(sys_, 1.0)
    EventManager.get().dispatch()
    # the sphere falls THROUGH the area trigger onto the plane
    assert sys_._bodies[hd.index].pos[1] < 1.2
    pairs = [{ev.get_first_handle(), ev.get_second_handle()}
             for ev in got]
    assert any({ha, hd} == p for p in pairs)


# -- constraints & character -------------------------------------------------

def test_point_constraint_pendulum():
    sys_, scene, _ = make_world()
    node = scene.create_node(translation=[2.0, 5.0, 0])
    h = sys_.add_sphere(node, MaterialInfo(
        mass=1.0, linear_damping=0.0, restitution=0.0))
    # pin the local point (-2, 0, 0) => world anchor at (0, 5, 0)
    sys_.add_point_constraint(h, [-2.0, 0.0, 0.0])
    run(sys_, 2.0)
    b = sys_._bodies[h.index]
    # Swings below the anchor, stays ~2 from it (soft constraint).
    r = np.linalg.norm((b.pos + np.array(
        [-2.0, 0, 0]) @ _rot3(b.rot).T) - np.array([0, 5, 0]))
    assert r < 0.6
    assert b.pos[1] < 5.0


def _rot3(q):
    from granite_tpu.physics.physics_system import _rot_mat
    return _rot_mat(q)


def test_kinematic_character_walk_and_jump():
    sys_, scene, _ = make_world()
    node = scene.create_node(translation=[0, 1.0, 0])  # unit sphere char
    ch = sys_.add_kinematic_character(node)
    ch.set_move_velocity([2.0, 0, 0])
    run(sys_, 1.0)
    assert ch.is_grounded()
    assert ch.pos[0] > 1.0                 # walked +x
    assert abs(ch.pos[1] - 1.0) < 0.05     # glued to the floor
    ch.jump([0, 5.0, 0])
    sys_.iterate(1 / 60)
    airborne_y = ch.pos[1]
    assert airborne_y > 1.0
    run(sys_, 1.5)
    assert ch.is_grounded()                # landed again
    assert abs(ch.pos[1] - 1.0) < 0.05
    # node follows
    assert abs(scene.translation[node][1] - ch.pos[1]) < 1e-5


def test_compound_and_remove():
    sys_, scene, _ = make_world()
    node = scene.create_node(translation=[0, 3.0, 0])
    parts = [ConvexMeshPart(MeshType.Sphere, radius=0.5),
             ConvexMeshPart(MeshType.Cube)]
    h = sys_.add_compound_object(node, parts,
                                 MaterialInfo(mass=2.0))
    run(sys_, 0.5)
    assert sys_._bodies[h.index].pos[1] < 3.0   # falling
    sys_.remove_body(h)
    assert not h.alive
    run(sys_, 0.2)                               # no crash after removal
