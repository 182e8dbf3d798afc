// C ABI for Python ctypes bindings (bez_isaacgym_tpu/native/bindings.py).
// The reference's C++ geometry has no Python bridge; ours exposes one so the
// host pipeline can call the native primitives directly.

#include <bez_geometry/line2.hpp>
#include <bez_geometry/point2.hpp>
#include <bez_geometry/point3.hpp>
#include <bez_geometry/pose3.hpp>
#include <bez_geometry/segment3.hpp>

#include <cstring>

using namespace bez;

extern "C" {

float bez_point2_norm(float x, float y) { return Point2(x, y).norm(); }

float bez_point3_norm(float x, float y, float z) {
    return Point3(x, y, z).norm();
}

float bez_point3_distance(const float* a, const float* b) {
    return Point3::distance(Point3(a[0], a[1], a[2]), Point3(b[0], b[1], b[2]));
}

// Writes up to max_points xyz triples into out; returns the count.
int bez_segment3_spaced_points(const float* p1, const float* p2, float spacing,
                               float* out, int max_points) {
    Segment3 s(Point3(p1[0], p1[1], p1[2]), Point3(p2[0], p2[1], p2[2]));
    auto pts = s.getSpacedPoints(spacing);
    int n = static_cast<int>(pts.size());
    if (n > max_points) n = max_points;
    for (int i = 0; i < n; ++i) {
        out[3 * i + 0] = pts[i].x;
        out[3 * i + 1] = pts[i].y;
        out[3 * i + 2] = pts[i].z;
    }
    return n;
}

// pose = [px py pz qx qy qz qw]; out = a.compose(b).
void bez_pose3_compose(const float* a, const float* b, float* out) {
    Pose3 pa(Point3(a[0], a[1], a[2]), Quaternion{a[3], a[4], a[5], a[6]});
    Pose3 pb(Point3(b[0], b[1], b[2]), Quaternion{b[3], b[4], b[5], b[6]});
    Pose3 r = pa.compose(pb);
    out[0] = r.position.x;
    out[1] = r.position.y;
    out[2] = r.position.z;
    out[3] = r.orientation.x;
    out[4] = r.orientation.y;
    out[5] = r.orientation.z;
    out[6] = r.orientation.w;
}

void bez_pose3_inverse(const float* a, float* out) {
    Pose3 pa(Point3(a[0], a[1], a[2]), Quaternion{a[3], a[4], a[5], a[6]});
    Pose3 r = pa.inverse();
    out[0] = r.position.x;
    out[1] = r.position.y;
    out[2] = r.position.z;
    out[3] = r.orientation.x;
    out[4] = r.orientation.y;
    out[5] = r.orientation.z;
    out[6] = r.orientation.w;
}

}  // extern "C"
