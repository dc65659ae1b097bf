package skinner;

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;

/**
 * Catalyst-side injection point for the learned join orders (SURVEY 4.3
 * option (c), the Spark analogue of the reference engine applying UCT
 * orders inside the engine rather than at the API boundary -
 * src/joining/JoinProcessor.java:46-207).
 *
 * The rule itself is a deliberately thin JVM shim: all reorder logic stays
 * in Python (skinnerdb_spark/plans/catalyst_rule.py), reached through the
 * py4j callback interface below. With no Python delegate registered - or on
 * ANY delegate failure - the rule is the identity, so plain spark.sql()
 * users never see an error from it.
 *
 * Registered at runtime via spark.experimental().extraOptimizations (the
 * user-provided-optimizer batch, which runs after Catalyst's own join
 * reordering - so what this rule emits is what executes). The jar must be
 * on the driver classpath at JVM launch (session.py adds it when built);
 * sessions without it fall back cleanly to Engine.adaptive_sql.
 */
public class SkinnerReorderRule extends Rule<LogicalPlan> {

    /** Implemented from Python via a py4j callback proxy. */
    public interface Reorderer {
        /** Return a replacement plan, or null to leave the input unchanged. */
        LogicalPlan reorder(LogicalPlan plan);
    }

    public static volatile Reorderer impl = null;

    @Override
    public LogicalPlan apply(LogicalPlan plan) {
        Reorderer r = impl;
        if (r == null) {
            return plan;
        }
        try {
            LogicalPlan out = r.reorder(plan);
            return out == null ? plan : out;
        } catch (Throwable t) {
            // adaptive ordering must never break a query
            return plan;
        }
    }

    @Override
    public String ruleName() {
        return "skinner.SkinnerReorderRule";
    }
}
