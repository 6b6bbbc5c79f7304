// Cross-validation data generator: encodes and decodes deterministic inputs
// with the reference library; outputs are compared bit-exactly against
// polar_codes_tpu (tests/test_crosscheck.py protocol).
#include <polarcode/construction/bhattacharrya.h>
#include <polarcode/decoding/fastssc_avx_float.h>
#include <polarcode/decoding/scl_avx_float.h>
#include <polarcode/encoding/butterfly_fip_packed.h>
#include <polarcode/errordetection/crc8.h>
#include <cstdio>
#include <cstring>
#include <random>
#include <vector>

using namespace PolarCode;

int main(int argc, char** argv) {
    const size_t N = 256, K = 128, L = 8;
    const int blocks = 64;
    Construction::Bhattacharrya cons(N, K, 0.0);
    auto frozen = cons.construct();

    Encoding::ButterflyFipPacked encoder(N, frozen);
    encoder.setSystematic(true);
    encoder.setErrorDetection(new ErrorDetection::CRC8());
    Decoding::FastSscAvxFloat sc(N, frozen);
    sc.setSystematic(true);
    Decoding::SclAvxFloat scl(N, L, frozen);
    scl.setSystematic(true);
    scl.setErrorDetection(new ErrorDetection::CRC8());

    // deterministic inputs: LCG bytes for info, Box-Muller-free noise from
    // a second LCG mapped to (-4, 4) uniform — continuous, tie-free
    std::mt19937_64 gen(777);
    std::uniform_int_distribution<int> byted(0, 255);
    std::uniform_real_distribution<float> noised(-4.0f, 4.0f);

    FILE* f_in = fopen("/tmp/refbench/cc_info.bin", "wb");
    FILE* f_llr = fopen("/tmp/refbench/cc_llr.bin", "wb");
    FILE* f_enc = fopen("/tmp/refbench/cc_encoded.bin", "wb");
    FILE* f_sc = fopen("/tmp/refbench/cc_sc_out.bin", "wb");
    FILE* f_scl = fopen("/tmp/refbench/cc_scl_out.bin", "wb");

    std::vector<unsigned char> info(K / 8), out(K / 8), cw(N / 8);
    std::vector<float> llr(N);
    for (int b = 0; b < blocks; ++b) {
        for (auto& x : info) x = byted(gen);
        fwrite(info.data(), 1, K / 8, f_in);
        encoder.setInformation(info.data());
        encoder.encode();
        encoder.getEncodedData(cw.data());
        fwrite(cw.data(), 1, N / 8, f_enc);
        for (size_t i = 0; i < N; ++i) {
            float tx = ((cw[i / 8] >> (7 - i % 8)) & 1) ? -1.0f : 1.0f;
            llr[i] = 2.0f * tx + noised(gen);  // SNR-ish, decisions nontrivial
        }
        fwrite(llr.data(), sizeof(float), N, f_llr);
        sc.setSignal(llr.data());
        sc.decode();
        sc.getDecodedInformationBits(out.data());
        fwrite(out.data(), 1, K / 8, f_sc);
        scl.setSignal(llr.data());
        scl.decode();
        scl.getDecodedInformationBits(out.data());
        fwrite(out.data(), 1, K / 8, f_scl);
    }
    fclose(f_in); fclose(f_llr); fclose(f_enc); fclose(f_sc); fclose(f_scl);
    printf("wrote %d blocks\n", blocks);
    return 0;
}
