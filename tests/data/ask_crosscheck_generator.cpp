// ASK modem cross-validation generator: runs the reference library's
// Ask modem (src/signalprocessing/modulation/ask.cpp) on deterministic
// inputs and dumps (bits, modulated symbols, noisy symbols, demodulated
// LLRs) for bps in {2, 3}. Outputs are compared value-exactly against
// polar_codes_tpu.dsp.ask_modulate / ask_demodulate
// (tests/test_scan_puncture.py::TestAskCrosscheck protocol).
//
// Build (no cmake needed):
//   g++ -O3 -march=native -mavx2 -I/root/reference/include \
//       ask_crosscheck_generator.cpp \
//       /root/reference/src/signalprocessing/modulation/ask.cpp \
//       /root/reference/src/signalprocessing/modulation/bpsk.cpp \
//       /root/reference/src/signalprocessing/modulation/modem.cpp \
//       -o ask_crosscheck && ./ask_crosscheck <outdir>
#include <signalprocessing/modulation/ask.h>
#include <cstdio>
#include <random>
#include <string>
#include <vector>

using namespace SignalProcessing::Modulation;

static void dump(const std::string& path, const std::vector<float>& v) {
    FILE* f = fopen(path.c_str(), "wb");
    fwrite(v.data(), sizeof(float), v.size(), f);
    fclose(f);
}

int main(int argc, char** argv) {
    const std::string outdir = argc > 1 ? argv[1] : ".";
    const size_t nbits = 3 * 1024; // divisible by 2 and 3: no padding path
    std::mt19937_64 gen(4242);
    std::uniform_int_distribution<int> bitd(0, 1);
    std::uniform_real_distribution<float> noised(-2.0f, 2.0f);

    // the modem takes bits in the float sign-bit convention (FloatContainer:
    // bit 1 = -0.0f, bit 0 = +0.0f; Bpsk::modulate_simple ORs in 1.0f)
    std::vector<float> bits(nbits), bits01(nbits);
    for (size_t i = 0; i < nbits; ++i) {
        int b = bitd(gen);
        bits01[i] = (float)b;
        bits[i] = b ? -0.0f : 0.0f;
    }

    for (unsigned bps : {2u, 3u}) {
        Ask ask(bps);
        auto* in = new std::vector<float>(bits);
        ask.setInputSignal(in);
        ask.modulate();
        std::vector<float> tx = *ask.outputSignal();
        dump(outdir + "/ask_mod_bps" + std::to_string(bps) + ".bin", tx);

        // deterministic "noisy" received symbols (uniform offsets -- the
        // demodulator is a pure function of the received value)
        std::vector<float> rx = tx;
        for (auto& s : rx)
            s += noised(gen);
        dump(outdir + "/ask_rx_bps" + std::to_string(bps) + ".bin", rx);

        auto* rin = new std::vector<float>(rx);
        ask.setInputSignal(rin);
        ask.demodulate();
        std::vector<float> llr = *ask.outputSignal();
        dump(outdir + "/ask_demod_bps" + std::to_string(bps) + ".bin", llr);
    }
    dump(outdir + "/ask_bits.bin", bits01);
    printf("wrote ASK fixtures to %s\n", outdir.c_str());
    return 0;
}
