// Implementations for the bez geometry primitives.
// Reference parity: resources/library/geometry/src/soccer_geometry/*.cpp.

#include <bez_geometry/line2.hpp>
#include <bez_geometry/point2.hpp>
#include <bez_geometry/point3.hpp>
#include <bez_geometry/pose3.hpp>
#include <bez_geometry/segment2.hpp>
#include <bez_geometry/segment3.hpp>

#include <cmath>

namespace bez {

// ---- Point2 ---------------------------------------------------------------

float Point2::norm() const { return std::sqrt(x * x + y * y); }

float Point2::distance(const Point2& a, const Point2& b) {
    const float dx = a.x - b.x;
    const float dy = a.y - b.y;
    return std::sqrt(dx * dx + dy * dy);
}

// ---- Point3 ---------------------------------------------------------------

float Point3::norm() const { return std::sqrt(x * x + y * y + z * z); }

float Point3::distance(const Point3& a, const Point3& b) {
    const float dx = a.x - b.x;
    const float dy = a.y - b.y;
    const float dz = a.z - b.z;
    return std::sqrt(dx * dx + dy * dy + dz * dz);
}

// ---- Segment2 -------------------------------------------------------------

float Segment2::slope() const {
    if (p2.x == p1.x) return INFINITY;
    return (p2.y - p1.y) / (p2.x - p1.x);
}

float Segment2::length() const { return Point2::distance(p1, p2); }

// ---- Segment3 -------------------------------------------------------------

float Segment3::length() const { return Point3::distance(p1, p2); }

std::vector<Point3> Segment3::getSpacedPoints(float spacing) const {
    std::vector<Point3> points;
    if (!(spacing > 0.0f) || !std::isfinite(spacing)) {
        points.push_back(p1);
        points.push_back(p2);
        return points;
    }
    const int count = static_cast<int>(std::floor(length() / spacing));
    if (count == 0) {
        points.push_back(p1);
        points.push_back(p2);
        return points;
    }
    const float dx = (p2.x - p1.x) / static_cast<float>(count);
    const float dy = (p2.y - p1.y) / static_cast<float>(count);
    const float dz = (p2.z - p1.z) / static_cast<float>(count);
    points.reserve(count + 1);
    for (int i = 0; i <= count; ++i) {
        points.emplace_back(p1.x + i * dx, p1.y + i * dy, p1.z + i * dz);
    }
    return points;
}

// ---- Line2 ----------------------------------------------------------------

Line2 Line2::through(const Point2& a, const Point2& b) {
    // Normal angle is perpendicular to the segment direction.
    const float theta = std::atan2(b.x - a.x, -(b.y - a.y));
    const float rho = a.x * std::cos(theta) + a.y * std::sin(theta);
    return Line2(rho, theta);
}

float Line2::distance(const Point2& p) const {
    return std::fabs(p.x * std::cos(theta) + p.y * std::sin(theta) - rho);
}

// ---- Pose3 ----------------------------------------------------------------

static Quaternion qmul(const Quaternion& a, const Quaternion& b) {
    Quaternion r;
    r.x = a.w * b.x + a.x * b.w + a.y * b.z - a.z * b.y;
    r.y = a.w * b.y - a.x * b.z + a.y * b.w + a.z * b.x;
    r.z = a.w * b.z + a.x * b.y - a.y * b.x + a.z * b.w;
    r.w = a.w * b.w - a.x * b.x - a.y * b.y - a.z * b.z;
    return r;
}

static Point3 qrot(const Quaternion& q, const Point3& v) {
    // v + 2*qv x (qv x v + w*v)
    const float tx = 2.0f * (q.y * v.z - q.z * v.y);
    const float ty = 2.0f * (q.z * v.x - q.x * v.z);
    const float tz = 2.0f * (q.x * v.y - q.y * v.x);
    return Point3(v.x + q.w * tx + (q.y * tz - q.z * ty),
                  v.y + q.w * ty + (q.z * tx - q.x * tz),
                  v.z + q.w * tz + (q.x * ty - q.y * tx));
}

Point3 Pose3::transform(const Point3& p) const {
    const Point3 r = qrot(orientation, p);
    return Point3(r.x + position.x, r.y + position.y, r.z + position.z);
}

Pose3 Pose3::compose(const Pose3& other) const {
    return Pose3(transform(other.position), qmul(orientation, other.orientation));
}

Pose3 Pose3::inverse() const {
    Quaternion qc{-orientation.x, -orientation.y, -orientation.z, orientation.w};
    const Point3 p = qrot(qc, position);
    return Pose3(Point3(-p.x, -p.y, -p.z), qc);
}

}  // namespace bez
