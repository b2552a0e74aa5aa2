package graft.api;

import java.lang.annotation.ElementType;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;

/**
 * Marks the identity field of a mapped entity (the JPA-lite surface of
 * the reference's object database: db/object maps POJOs with
 * javax.persistence Id/Version detected reflectively in
 * OObjectSerializerHelper.java; this engine ships its own annotation
 * because it takes no external dependencies). On a Scala case class,
 * annotate the constructor parameter as {@code @(Id @field)} so the
 * annotation lands on the backing field; a field literally named
 * {@code id} is recognized without any annotation.
 */
@Retention(RetentionPolicy.RUNTIME)
@Target({ElementType.FIELD})
public @interface Id {}
