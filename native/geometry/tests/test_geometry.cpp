// C++ geometry unit tests — mirrors the reference gtest suite's coverage
// (resources/library/geometry/tests/soccer_geometry/test_geometry.cpp:8-63)
// plus the pose/line functionality ours adds.

#include <bez_geometry/line2.hpp>
#include <bez_geometry/point2.hpp>
#include <bez_geometry/point3.hpp>
#include <bez_geometry/pose3.hpp>
#include <bez_geometry/segment2.hpp>
#include <bez_geometry/segment3.hpp>

#include "../../minitest.hpp"

using namespace bez;

TEST(Geometry, Segment2Slope) {
    Segment2 s(Point2(1, 1), Point2(2, 2));
    ASSERT_FLOAT_EQ(1.0f, s.slope());
}

TEST(Geometry, Segment2SlopeVertical) {
    Segment2 s(Point2(1, 0), Point2(1, 5));
    ASSERT_TRUE(std::isinf(s.slope()));
}

TEST(Geometry, Segment2Length) {
    Segment2 s(Point2(1, 1), Point2(2, 2));
    ASSERT_FLOAT_EQ(1.4142135f, s.length());
}

TEST(Geometry, Point2Distance) {
    ASSERT_FLOAT_EQ(1.4142135f, Point2::distance(Point2(1, 1), Point2(2, 2)));
}

TEST(Geometry, Point2Norm) { ASSERT_FLOAT_EQ(5.0f, Point2(3, 4).norm()); }

TEST(Geometry, Segment3Length) {
    Segment3 s(Point3(1, 1, 1), Point3(2, 2, 2));
    ASSERT_FLOAT_EQ(1.732050808f, s.length());
}

TEST(Geometry, Segment3GetSpacedPoints) {
    Segment3 s(Point3(1, 1, 1), Point3(1, 1, 2));
    auto list = s.getSpacedPoints(0.1f);
    ASSERT_EQ(11u, list.size());
    for (int i = 0; i < 11; ++i) {
        ASSERT_FLOAT_EQ(list[i].z, 1.0f + i * 0.1f);
    }
}

TEST(Geometry, Segment3GetSpacedPointsDegenerate) {
    Segment3 s(Point3(0, 0, 0), Point3(0, 0, 0.05f));
    auto list = s.getSpacedPoints(0.1f);  // shorter than spacing
    ASSERT_EQ(2u, list.size());
}

TEST(Geometry, Point3Distance) {
    ASSERT_FLOAT_EQ(1.732050808f,
                    Point3::distance(Point3(1, 1, 1), Point3(2, 2, 2)));
}

TEST(Geometry, Point3Norm) {
    ASSERT_FLOAT_EQ(6.403124237f, Point3(3, 4, 4).norm());
}

TEST(Geometry, Line2ThroughAndDistance) {
    Line2 l = Line2::through(Point2(0, 1), Point2(1, 1));  // y = 1
    ASSERT_NEAR(0.0f, l.distance(Point2(5, 1)), 1e-6f);
    ASSERT_NEAR(2.0f, l.distance(Point2(0, 3)), 1e-6f);
}

TEST(Geometry, Pose3RoundTrip) {
    Quaternion q{0.0f, 0.0f, 0.7071068f, 0.7071068f};  // 90 deg about z
    Pose3 p(Point3(1, 2, 3), q);
    Point3 v(1, 0, 0);
    Point3 w = p.transform(v);
    ASSERT_NEAR(1.0f, w.x, 1e-5f);
    ASSERT_NEAR(3.0f, w.y, 1e-5f);
    ASSERT_NEAR(3.0f, w.z, 1e-5f);
    Pose3 id = p.compose(p.inverse());
    ASSERT_NEAR(0.0f, id.position.norm(), 1e-5f);
    ASSERT_NEAR(1.0f, std::fabs(id.orientation.w), 1e-5f);
}

int main() { return RUN_ALL_TESTS(); }
