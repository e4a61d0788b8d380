"""Family chunks of the query registry — imported IN ORDER
by plans/queries.py (QUERIES insertion order is the
contract; never reorder these imports)."""

FAMILY_MODULES = [
    "f00_q1_pricing_summary",
    "f01_json_struct_parse",
    "f02_interarrival_percentiles",
    "f03_inverted_index_postings",
    "f04_l_diversity_customers",
    "f05_bigram_containment_pairs",
    "f06_iblt_set_reconcile",
    "f07_emd_price_drift",
    "f08_mann_whitney_priority_nation",
    "f09_ohlc_monthly_orders",
    "f10_mcnemar_repeat_purchase",
    "f11_neyman_allocation_nations",
    # round-10 additions (new registrations append to the registry
    # tail; pre-existing order unchanged)
    "f12_r10_wave1",
    "f13_r10_wave2",
    "f14_r10_wave3",
    "f15_r10_wave4",
    "f16_r10_wave5",
    "f17_r10_wave6",
    "f18_r10_wave7",
    "f19_r10_wave8",
    "f20_r10_wave9",
    "f21_r10_wave10",
    "f22_r10_wave11",
    "f23_r10_wave12",
    "f24_r10_wave13",
    "f25_r10_wave14",
    # round-11 additions
    "f26_r11_wave1",
    "f27_r11_wave2",
    "f28_r11_wave3",
    "f29_r11_wave4",
    "f30_r11_wave5",
    "f31_r11_wave6",
    "f32_r11_wave7",
    "f33_r11_wave8",
    "f34_r11_wave9",
    "f35_r11_wave10",
    "f36_r11_wave11",
    "f37_r11_wave12",
    # round-12 additions
    "f38_r12_wave1",
    "f39_r12_wave2",
]
