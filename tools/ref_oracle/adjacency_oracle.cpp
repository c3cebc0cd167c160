// Adjacency parity oracle: compiles the REFERENCE's own matching stack
// (/root/reference/src/math/_homography.cpp + _util.cpp, unmodified, via
// include path) into a harness that dumps raw ratio-test match counts,
// accepted adjacency weights, and cleaned match counts for the bundled
// `map` sequence — the values tests/test_adjacency_parity.py gates
// against (the reference's panorama::test inspection output,
// _panorama.cpp:572-609, reproduced headlessly).
//
// Build & run (needs OpenCV C++ + the Eigen headers TensorFlow vendors):
//   bash tools/ref_oracle/build_and_run.sh
//
// No reference code is copied into this repository; the reference tree is
// referenced at build time only, to produce oracle NUMBERS.

#include <cstdio>
#include <vector>
#include <string>
#include <opencv2/opencv.hpp>
#include "_homography.h"

int main(int argc, char** argv) {
    std::string seq = argc > 1 ? argv[1] : "map";
    int init_size = argc > 2 ? std::atoi(argv[2]) : 700;
    std::string pattern = seq == "map"
        ? "/root/reference/results/map/budapest*.jpg"
        : "/root/reference/results/" + seq + "/resized*.jpg";
    std::vector<std::string> paths;
    cv::glob(pattern, paths);
    std::sort(paths.begin(), paths.end());

    std::vector<cv::Mat> imgs;
    for (auto& p : paths) {
        cv::Mat im = cv::imread(p);
        // images::load_resized rules (_image.cpp:29-73): clamp max side
        if (std::max(im.rows, im.cols) > init_size) {
            double s;
            if (im.cols >= im.rows) s = double(init_size) / im.cols;
            else s = double(init_size) / im.rows;
            cv::resize(im, im, cv::Size(), s, s, cv::INTER_AREA);
        }
        imgs.push_back(im);
    }
    int n = imgs.size();
    fprintf(stderr, "loaded %d images\n", n);

    // pan::config defaults (_panorama.h:80-125)
    util::match_conf conf;
    conf.max_images_per_match = 5;
    conf.RANSAC_iterations = 1500;
    conf.max_keypoints = 250;
    conf.x_margin = 4;
    conf.min_overlap = .15f;
    conf.overlap_inl_match = .1f;
    conf.overlap_inl_keyp = .005f;
    conf.conf = .025f;
    conf.nfeatures = 0;
    conf.nOctaveLayers = 4;
    conf.contrastThreshold = 3e-2;
    conf.edgeThreshold = 6;
    conf.sigma_sift = 1.4142;

    std::vector<int> idx(n);
    for (int i = 0; i < n; i++) idx[i] = i;
    std::vector<util::keypoints> kps = util::extrace_kp_vector(imgs, idx,
                                                               &conf);
    printf("{\n\"kp_counts\": [");
    for (int i = 0; i < n; i++)
        printf("%s%d", i ? ", " : "", (int)kps[i].keypoint.size());
    printf("],\n");

    util::adj_calculator calc(imgs, kps, &conf, NULL, NULL);
    calc.get_threads(1);
    calc.get_match_number_matrix(0);

    printf("\"raw_counts\": [");
    for (int i = 0; i < n; i++) {
        printf("%s[", i ? ", " : "");
        for (int j = 0; j < n; j++)
            printf("%s%.0f", j ? ", " : "", calc.adj.at<double>(i, j));
        printf("]");
    }
    printf("],\n");

    calc.heuristic_match_filter(conf.max_images_per_match);
    calc.cal_adj(imgs, 0);

    printf("\"adj_weights\": [");
    for (int i = 0; i < n; i++) {
        printf("%s[", i ? ", " : "");
        for (int j = 0; j < n; j++)
            printf("%s%.4f", j ? ", " : "", calc.adj.at<double>(i, j));
        printf("]");
    }
    printf("],\n");

    printf("\"clean_match_counts\": [");
    for (int i = 0; i < n; i++) {
        printf("%s[", i ? ", " : "");
        for (int j = 0; j < n; j++)
            printf("%s%d", j ? ", " : "", (int)calc.match_mat[i][j].size());
        printf("]");
    }
    printf("],\n");

    float focal = util::focal_from_hom(calc.hom_mat, calc.adj);
    printf("\"focal\": %.2f\n}\n", focal);
    return 0;
}
